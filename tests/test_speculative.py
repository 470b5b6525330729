"""Prompt-lookup speculative decoding: greedy-exact equivalence and
drafting behavior (CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache, TINY_LLAMA, init_llama_params)
from quantizations_tpu.serve.generate import make_generate_fn
from quantizations_tpu.serve.speculative import (
    draft_prompt_lookup, make_speculative_generate_fn)

CFG = TINY_LLAMA
SERVE = ServeConfig(max_seq_len=128, max_new_tokens=24, temperature=0.0)


def test_draft_prompt_lookup():
    hist = jnp.asarray([[5, 6, 7, 8, 9, 5, 6, 0, 0, 0]], jnp.int32)
    hcnt = jnp.asarray([7], jnp.int32)
    # current bigram (5, 6) matched at j=0 -> draft from position 2
    d = np.asarray(draft_prompt_lookup(hist, hcnt, 3))
    np.testing.assert_array_equal(d[0], [7, 8, 9])
    # no earlier match -> repeat of last token
    hist2 = jnp.asarray([[1, 2, 3, 4, 0, 0]], jnp.int32)
    d2 = np.asarray(draft_prompt_lookup(hist2, jnp.asarray([4]), 2))
    np.testing.assert_array_equal(d2[0], [4, 0])


def test_speculative_matches_greedy():
    """Spec decode emits the EXACT greedy token stream for any drafts."""
    params = init_llama_params(CFG, seed=0)
    # prompts engineered with repetition (lookup hits) and without
    prompts = [
        [3, 5, 7, 11, 3, 5, 7, 11],
        [1, 2, 3, 4, 5, 6, 7, 9],
    ]
    gen = make_generate_fn(CFG, SERVE)
    spec = make_speculative_generate_fn(CFG, SERVE, draft_k=4)
    for p in prompts:
        ids = jnp.asarray([p], jnp.int32)
        ref = np.asarray(
            gen(params, ids, KVCache.create(CFG, 1, SERVE.max_seq_len),
                jax.random.PRNGKey(0))[0])
        toks, steps, _ = spec(
            params, ids, KVCache.create(CFG, 1, SERVE.max_seq_len),
            jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(toks), ref)
        assert int(steps) <= SERVE.max_new_tokens


def test_speculative_batch():
    params = init_llama_params(CFG, seed=1)
    ids = jnp.asarray([[3, 5, 7, 11, 3, 5, 7, 11],
                       [2, 4, 6, 8, 2, 4, 6, 8]], jnp.int32)
    gen = make_generate_fn(CFG, SERVE)
    spec = make_speculative_generate_fn(CFG, SERVE, draft_k=4)
    ref = np.asarray(
        gen(params, ids, KVCache.create(CFG, 2, SERVE.max_seq_len),
            jax.random.PRNGKey(0))[0])
    toks, steps, _ = spec(
        params, ids, KVCache.create(CFG, 2, SERVE.max_seq_len),
        jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks), ref)


def test_spec_accept_sample_is_distributionally_exact():
    """Accept-draft-with-prob-p(d) + rejection-resample-excluding-d
    composes to EXACTLY the temperature-sampling law, whatever d is."""
    from quantizations_tpu.serve.speculative import spec_accept_sample

    logits = jnp.asarray([[[2.0, 1.0, 0.0, -1.0]]], jnp.float32)
    temp = 0.8
    p = np.asarray(jax.nn.softmax(logits[0, 0] / temp))
    draft = jnp.asarray([[1]], jnp.int32)   # propose token 1 always

    counts = np.zeros(4)
    NKEYS = 4000
    ok_fn = jax.jit(lambda k: spec_accept_sample(
        logits, draft, k, temp))
    for i in range(NKEYS):
        ok, corr = ok_fn(jax.random.PRNGKey(i))
        tok = 1 if bool(ok[0, 0]) else int(corr[0, 0])
        counts[tok] += 1
    freq = counts / NKEYS
    np.testing.assert_allclose(freq, p, atol=0.025)
    # greedy special case
    ok, corr = spec_accept_sample(logits, draft, jax.random.PRNGKey(0),
                                  0.0)
    assert not bool(ok[0, 0]) and int(corr[0, 0]) == 0


def test_spec_window_bonus_position_is_distributionally_exact():
    """The FULL-ACCEPT window's last ("bonus") token must follow the
    temperature-sampling law. Regression: always emitting the masked
    correction sample there means the bonus token can NEVER equal
    draft[K-1], suppressing the draft's (often dominant) mass."""
    from quantizations_tpu.serve.speculative import (
        spec_accept_sample, spec_window_tokens)

    K, V = 3, 4
    temp = 0.8
    logits = jnp.broadcast_to(
        jnp.asarray([2.0, 1.0, 0.0, -1.0], jnp.float32), (1, K, V))
    p = np.asarray(jax.nn.softmax(logits[0, 0] / temp))
    draft = jnp.asarray([[0, 0, 0]], jnp.int32)  # draft = argmax: full
    # accepts are frequent and the bonus slot is exercised hard

    def window(k):
        okk, corr = spec_accept_sample(logits, draft, k, temp)
        g, a = spec_window_tokens(okk, corr, draft)
        return g, a

    window = jax.jit(window)
    counts = np.zeros(V)
    n_full = 0
    NKEYS = 4000
    for i in range(NKEYS):
        g, a = window(jax.random.PRNGKey(i))
        if int(a[0]) == K - 1:          # full accept: bonus slot emitted
            n_full += 1
            counts[int(g[0, K - 1])] += 1
    # acceptance uniforms are independent across positions, so the
    # bonus token conditional on full accept is distributed exactly p
    assert n_full > 500
    np.testing.assert_allclose(counts / n_full, p, atol=0.04)
    assert counts[0] > 0  # the regression: draft token never emitted


def test_speculative_temperature_runs():
    """Temperature > 0 spec decode produces valid, key-deterministic
    streams."""
    import dataclasses

    params = init_llama_params(CFG, seed=0)
    serve = dataclasses.replace(SERVE, temperature=0.9)
    spec = make_speculative_generate_fn(CFG, serve, draft_k=4)
    ids = jnp.asarray([[3, 5, 7, 11, 3, 5, 7, 11]], jnp.int32)
    t1, s1, _ = spec(params, ids,
                     KVCache.create(CFG, 1, SERVE.max_seq_len),
                     jax.random.PRNGKey(1))
    t2, s2, _ = spec(params, ids,
                     KVCache.create(CFG, 1, SERVE.max_seq_len),
                     jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert np.all((np.asarray(t1) >= 0)
                  & (np.asarray(t1) < CFG.vocab_size))
