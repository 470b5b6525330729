"""Continuous-batching engine tests (BASELINE config 5, single host).

The engine must produce, for each request, exactly the tokens the plain
batch-1 generate loop produces — while serving several interleaved
requests at different sequence positions from one batched cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache,
    TINY_LLAMA,
    init_llama_params,
)
from quantizations_tpu.serve.engine import Engine
from quantizations_tpu.serve.generate import make_generate_fn

CFG = TINY_LLAMA
MAX_SEQ = 48


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, seed=0)


def _reference_tokens(params, prompt, n):
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=n,
                        temperature=0.0, donate_cache=False)
    gen = make_generate_fn(CFG, serve)
    ids = jnp.asarray([prompt], jnp.int32)
    toks, _ = gen(params, ids, KVCache.create(CFG, 1, MAX_SEQ),
                  jax.random.PRNGKey(0))
    return list(np.asarray(toks)[0])


def test_single_request_matches_generate(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8, 16))
    prompt = [3, 1, 4, 1, 5]
    uid = eng.submit(prompt, max_new_tokens=6)
    done = eng.run()
    assert done[uid].done
    assert done[uid].output_ids == _reference_tokens(params, prompt, 6)


def test_interleaved_requests_match_isolated(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9], [5, 5, 5, 5]]
    lens = [5, 7, 4, 6]
    uids = [eng.submit(p, max_new_tokens=n) for p, n in zip(prompts, lens)]
    done = eng.run()
    assert len(done) == 4
    for uid, p, n in zip(uids, prompts, lens):
        assert done[uid].output_ids == _reference_tokens(params, p, n), uid


def test_eos_stops_early(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=1, prefill_buckets=(8,))
    prompt = [3, 1, 4]
    ref = _reference_tokens(params, prompt, 8)
    eos = ref[3]  # force stop at the 4th generated token
    uid = eng.submit(prompt, max_new_tokens=8, eos_id=eos)
    done = eng.run()
    assert done[uid].output_ids == ref[:4]


def test_per_request_temperature_and_streaming(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,),
                 temperature=0.0, seed=3)
    streamed = []
    eng.on_token = lambda req, tok: streamed.append((req.uid, tok))
    u_greedy = eng.submit([3, 1, 4], max_new_tokens=5)       # default: greedy
    u_hot = eng.submit([3, 1, 4], max_new_tokens=5, temperature=1.5)
    done = eng.run()
    ref = _reference_tokens(params, [3, 1, 4], 5)
    assert done[u_greedy].output_ids == ref
    assert all(0 <= t < CFG.vocab_size for t in done[u_hot].output_ids)
    # streaming saw every token of both requests
    assert sorted(t for u, t in streamed if u == u_greedy) == sorted(ref)
    assert len([1 for u, _ in streamed if u == u_hot]) == 5


def test_batched_admission_near_cache_end_falls_back(params):
    """When a live slot sits close to max_seq the batched in-place
    prefill would clamp its garbage writes onto the live row's valid
    tail — admission must take the scratch path and stay exact."""
    serve = ServeConfig(max_seq_len=24)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(16,))
    p1, p2 = [3, 1, 4], [2, 7, 1, 8]
    u1 = eng.submit(p1, max_new_tokens=18)   # will run close to 24
    # drive until slot 0 is near the end, then queue a second request
    for _ in range(14):
        eng.step()
    u2 = eng.submit(p2, max_new_tokens=4)
    done = eng.run()
    assert done[u1].output_ids == _reference_tokens(params, p1, 18)
    assert done[u2].output_ids == _reference_tokens(params, p2, 4)


def test_temp0_request_in_hot_engine_is_deterministic(params):
    """A temperature=0 request must be fully greedy — INCLUDING its
    first token, which the prefill closure samples — even when the
    engine default temperature is > 0 (regression: the prefill used to
    bake the engine-global temperature)."""
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,),
                 temperature=1.5, seed=11)
    uid = eng.submit([3, 1, 4], max_new_tokens=5, temperature=0.0)
    done = eng.run()
    assert done[uid].output_ids == _reference_tokens(params, [3, 1, 4], 5)


def test_top_p_sampling_masks_tail():
    """top-p keeps the smallest prefix of probability-sorted tokens whose
    mass reaches p — a peaked distribution becomes effectively greedy."""
    import jax
    import jax.numpy as jnp

    from quantizations_tpu.serve.generate import sample_logits

    logits = jnp.log(jnp.asarray([[0.6, 0.25, 0.1, 0.05]], jnp.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    # p=0.5: only token 0 survives (its own mass already reaches 0.5)
    toks = jnp.stack([sample_logits(logits, k, temperature=1.0, top_p=0.5)
                      for k in keys[:50]])
    assert bool(jnp.all(toks == 0))
    # p=0.7: tokens {0, 1} survive; token 2/3 never drawn
    toks = jnp.stack([sample_logits(logits, k, temperature=1.0, top_p=0.7)
                      for k in keys])
    assert set(np.unique(np.asarray(toks))) <= {0, 1}
    assert 1 in np.asarray(toks)
    # p=1.0: no mask — all tokens reachable
    toks = jnp.stack([sample_logits(logits, k, temperature=1.0)
                      for k in keys])
    assert set(np.unique(np.asarray(toks))) == {0, 1, 2, 3}


def test_eos_freeze_in_generate():
    """A row that emits serve.eos_id keeps emitting it for the rest of
    the (static-length) scan."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from quantizations_tpu.models.llama import KVCache, init_llama_params
    from quantizations_tpu.serve.generate import make_generate_fn

    cfg = CFG
    serve0 = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=10)
    params = init_llama_params(cfg, seed=0)
    prompt = jnp.asarray([[3, 5, 7, 11]], jnp.int32)
    key = jax.random.PRNGKey(0)

    gen = make_generate_fn(cfg, serve0)
    toks = np.asarray(gen(params, prompt,
                          KVCache.create(cfg, 1, serve0.max_seq_len),
                          key)[0])[0]
    eos = int(toks[3])  # pretend the 4th generated token is eos
    serve_eos = dataclasses.replace(serve0, eos_id=eos)
    gen2 = make_generate_fn(cfg, serve_eos)
    toks2 = np.asarray(gen2(params, prompt,
                            KVCache.create(cfg, 1, serve0.max_seq_len),
                            key)[0])[0]
    first = int(np.argmax(toks2 == eos))
    assert eos in toks2.tolist()
    assert (toks2[first:] == eos).all()
    # tokens before the first eos match the unconstrained run
    np.testing.assert_array_equal(toks2[:first], toks[:first])


def test_chunked_prefill_long_prompt():
    """A prompt longer than the largest prefill bucket prefills in
    chunks and generates the same tokens as the whole-prompt jitted
    generate path."""
    import jax
    import jax.numpy as jnp

    from quantizations_tpu.models.llama import KVCache, init_llama_params
    from quantizations_tpu.serve.engine import Engine
    from quantizations_tpu.serve.generate import make_generate_fn

    params = init_llama_params(CFG, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    # buckets max out at 8; prompt of 19 forces 3 chunks (8 + 8 + 3)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(4, 8))
    prompt = [(i * 7 + 3) % CFG.vocab_size for i in range(19)]
    uid = eng.submit(prompt, max_new_tokens=6)
    done = eng.run()
    assert done[uid].output_ids == _reference_tokens(params, prompt, 6)


def test_multi_step_dispatch_matches_single(params):
    """run(steps_per_dispatch=4) emits the same greedy streams as the
    per-step loop (retirement at window boundaries discards only the
    throwaway tail)."""
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9]]
    lens = [6, 7, 5]

    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    uids = [eng.submit(p, max_new_tokens=n) for p, n in zip(prompts, lens)]
    done = eng.run(steps_per_dispatch=4)
    for uid, p, n in zip(uids, prompts, lens):
        assert done[uid].output_ids == _reference_tokens(params, p, n), uid


def test_engine_stats(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    eng.submit([3, 1, 4], max_new_tokens=4)
    eng.submit([2, 7, 1], max_new_tokens=4)
    eng.step()
    st = eng.stats()
    assert st["active_slots"] == 2 and st["steps"] == 1
    eng.run()
    st = eng.stats()
    assert st["finished"] == 2 and st["emitted_tokens"] == 8
    assert st["active_slots"] == 0 and st["queued"] == 0


def test_iter_prefill_chunks_shift_near_cache_end():
    """With max_len set, the final padded chunk is shifted back so its
    write window ends at the cache edge (re-feeding already-prefilled
    tokens) instead of letting dynamic_update_slice clamp-scatter KV to
    wrong positions."""
    from quantizations_tpu.serve.engine import iter_prefill_chunks

    # plain: no max_len -> unshifted
    assert iter_prefill_chunks(44, (8, 32)) == [(0, 32, 32), (32, 12, 32)]
    # 48-long cache: final window [32, 64) would overrun -> [16, 48)
    assert iter_prefill_chunks(44, (8, 32), max_len=48) == [
        (0, 32, 32), (16, 28, 32)]
    # exact fit is untouched
    assert iter_prefill_chunks(40, (8,), max_len=48) == [
        (i * 8, 8, 8) for i in range(5)]
    # base (prefix-cache cov) counts toward the window position;
    # the shifted start may reach below base (suffix coords < 0)
    got = iter_prefill_chunks(6, (16,), max_len=24, base=16)
    assert got == [(-8, 14, 16)]
    # a bucket longer than the cache can never fit
    with pytest.raises(ValueError):
        iter_prefill_chunks(12, (64,), max_len=48)


def test_near_end_admission_shifted_final_chunk(params):
    """A prompt whose final padded chunk would overrun max_seq streams
    exactly like the unchunked generate loop (the scratch admission
    path re-feeds the overlap instead of clamp-corrupting KV)."""
    rng = np.random.default_rng(7)
    prompt = [int(t) for t in rng.integers(1, CFG.vocab_size, 44)]
    n = 3
    ref = _reference_tokens(params, prompt, n)

    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=n)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8, 32))
    uid = eng.submit(prompt, max_new_tokens=n)
    done = eng.run()
    assert done[uid].output_ids == ref


def test_buckets_clamped_to_max_seq(params):
    """Default buckets wider than a small max_seq are dropped instead
    of tracing cache updates wider than the cache."""
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=2)
    eng = Engine(params, CFG, serve, slots=1,
                 prefill_buckets=(16, 64, 256))
    assert eng.buckets == (16,)
    uid = eng.submit([3, 1, 4, 1, 5], max_new_tokens=2)
    ref = _reference_tokens(params, [3, 1, 4, 1, 5], 2)
    assert eng.run()[uid].output_ids == ref
