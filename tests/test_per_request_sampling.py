"""Per-request top_k/top_p (VERDICT r2 #10).

``sample_rows`` accepts per-row traced top_k/top_p arrays; both engines
resolve request-level values against engine defaults into a [rows, 3]
(temperature, top_k, top_p) matrix. Each row's distribution is pinned
here: greedy rows are deterministic, top_k rows only ever sample from
the k highest logits, top_p rows only from the smallest prefix whose
mass reaches p — all in ONE batch, which is exactly what the static
per-engine form could not express.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.serve.engine import sample_rows, sample_rows_samp


def _draws(logits, samp, n=256, seed=0):
    """n sampled batches [n, rows] via the packed samp matrix."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    fn = jax.jit(sample_rows_samp)
    out = np.stack([np.asarray(fn(logits, samp, k)) for k in keys])
    return out


def test_rowwise_truncation_supports():
    # vocab of 8 with a known order: token i has logit -i
    V = 8
    base = -jnp.arange(V, dtype=jnp.float32)
    logits = jnp.tile(base, (4, 1))
    samp = jnp.asarray([
        [0.0, 0.0, 1.0],   # greedy
        [1.0, 2.0, 1.0],   # top_k=2 -> tokens {0, 1} only
        [1.0, 0.0, 0.30],  # top_p=.3: p(0)=.58 >= .3 -> token 0 only
        [5.0, 0.0, 1.0],   # hot: all tokens reachable
    ], jnp.float32)
    draws = _draws(logits, samp, n=200)
    assert set(np.unique(draws[:, 0])) == {0}
    assert set(np.unique(draws[:, 1])) <= {0, 1}
    assert 1 in draws[:, 1]          # really samples, not argmax
    assert set(np.unique(draws[:, 2])) == {0}
    assert len(set(np.unique(draws[:, 3]))) > 4   # high temp spreads


def test_rowwise_top_p_prefix_mass():
    # logits chosen so softmax = [.5, .25, .125, .125]: top_p=.74
    # keeps {0, 1} (mass before token 2 is .75 > .74 - epsilon rule:
    # keep while cumulative mass BEFORE the token < p)
    logits = jnp.log(jnp.asarray([[.5, .25, .125, .125]], jnp.float32))
    samp = jnp.asarray([[1.0, 0.0, 0.74]], jnp.float32)
    draws = _draws(logits, samp, n=300)
    assert set(np.unique(draws)) <= {0, 1}
    assert {0, 1} <= set(np.unique(draws))


def test_vector_matches_static_scalar():
    """A vector row must truncate identically to the static scalar
    path (same key, same logits)."""
    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(key, (5, 64), jnp.float32) * 3
    temps = jnp.full((5,), 0.9, jnp.float32)
    for tk, tp in [(4, 1.0), (0, 0.5), (3, 0.8)]:
        ks = jnp.full((5,), tk, jnp.int32)
        ps = jnp.full((5,), tp, jnp.float32)
        sk = jax.random.PRNGKey(123)
        a = np.asarray(sample_rows(logits, temps, sk, top_k=tk,
                                   top_p=tp))
        b = np.asarray(sample_rows(logits, temps, sk, top_k=ks,
                                   top_p=ps))
        np.testing.assert_array_equal(a, b)


def test_all_default_rows_skip_truncation():
    """top_k=0/top_p=1 vector rows must reproduce the untruncated
    path exactly (the lax.cond identity branch)."""
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (3, 32), jnp.float32)
    temps = jnp.asarray([0.0, 1.0, 0.5], jnp.float32)
    sk = jax.random.PRNGKey(11)
    plain = np.asarray(sample_rows(logits, temps, sk))
    samp = jnp.stack([temps, jnp.zeros(3), jnp.ones(3)], axis=1)
    packed = np.asarray(sample_rows_samp(logits, samp, sk))
    np.testing.assert_array_equal(plain, packed)


@pytest.mark.parametrize("engine_kind", ["slot", "paged"])
def test_engine_per_request_truncation(engine_kind):
    """End-to-end: two requests in ONE engine, one top_k=1 (argmax under
    any temperature) and one unrestricted hot request — the top_k=1
    stream must equal the greedy stream of the same prompt."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.models.llama import (TINY_LLAMA,
                                                init_llama_params)

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)

    def build():
        if engine_kind == "slot":
            from quantizations_tpu.serve.engine import Engine

            return Engine(params, cfg, ServeConfig(max_seq_len=128),
                          slots=2, prefill_buckets=(16,), seed=5)
        from quantizations_tpu.serve.paged import PagedEngine

        return PagedEngine(params, cfg, num_pages=9, page_size=16,
                           slots=2, max_seq=128,
                           prefill_buckets=(16,), seed=5)

    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    eng = build()
    eng.submit(prompt, max_new_tokens=8, temperature=0.0)
    greedy = eng.run()[1].output_ids

    eng2 = build()
    eng2.submit(prompt, max_new_tokens=8, temperature=1.5, top_k=1)
    eng2.submit(prompt, max_new_tokens=8, temperature=1.5)
    fin = eng2.run()
    assert fin[1].output_ids == greedy          # top_k=1 == argmax
    # the unrestricted hot row is overwhelmingly likely to diverge
    assert fin[2].output_ids != greedy
