"""Serving-time projection fusion (models/llama.fuse_projections):
qkv / gate_up fused dispatches must reproduce the unfused streams
bit-exactly — row results are independent of the row-tile split and
the K-chunk accumulation order is unchanged."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantizations_tpu.models.llama import (
    KVCache, TINY_LLAMA, fuse_projections, init_llama_params, prefill,
    decode_step)

PROMPT = [3, 1, 4, 1, 5, 9, 2, 6]


def _greedy(params, cfg, n=8):
    ids = jnp.asarray([PROMPT], jnp.int32)
    cache = KVCache.create(cfg, 1, 64)
    logits, cache = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg, last_token_only=True)
    )(params, ids, cache)
    toks = [int(jnp.argmax(logits[0, -1]))]
    step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, cfg))
    for i in range(n - 1):
        lg, cache = step(params, jnp.asarray([[toks[-1]]], jnp.int32),
                         cache, jnp.asarray([len(PROMPT) + i], jnp.int32))
        toks.append(int(jnp.argmax(lg[0])))
    return toks


@pytest.mark.parametrize("knobs", [
    dict(),                                   # Llama (no biases)
    dict(attention_bias=True),                # Qwen2 (qkv biases fuse)
    dict(qk_norm=True, attention_bias=False),  # Qwen3 per-head norms
])
def test_fused_projections_greedy_identical(knobs):
    cfg = dataclasses.replace(TINY_LLAMA, **knobs)
    params = init_llama_params(cfg, seed=0)
    ref = _greedy(params, cfg)
    fused = fuse_projections(params)
    assert fused.layers.q is None and fused.layers.gate is None
    got = _greedy(fused, cfg)
    assert got == ref, (got, ref)
    # idempotent
    assert fuse_projections(fused) is fused


def test_fused_projections_logits_bit_exact():
    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    fused = fuse_projections(params)
    ids = jnp.asarray([PROMPT], jnp.int32)
    lg_a, _ = jax.jit(lambda p, i: prefill(
        p, i, KVCache.create(cfg, 1, 64), cfg))(params, ids)
    lg_b, _ = jax.jit(lambda p, i: prefill(
        p, i, KVCache.create(cfg, 1, 64), cfg))(fused, ids)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))


def test_fused_paged_engine_matches_unfused():
    from quantizations_tpu.serve.paged import PagedEngine

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)

    def run(p):
        eng = PagedEngine(p, cfg, num_pages=16, page_size=16, slots=2,
                          max_seq=48, prefill_buckets=(8,))
        u = eng.submit(PROMPT, max_new_tokens=6)
        return eng.run()[u].output_ids

    assert run(fuse_projections(params)) == run(params)


def test_fused_slot_engine_matches_unfused():
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.serve.engine import Engine

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    serve = ServeConfig(max_seq_len=48)

    def run(p):
        eng = Engine(p, cfg, serve, slots=2, prefill_buckets=(8,))
        u = eng.submit(PROMPT, max_new_tokens=6)
        return eng.run()[u].output_ids

    assert run(fuse_projections(params)) == run(params)


def test_fused_params_rejected_by_parallel_factories():
    from jax.sharding import Mesh
    from quantizations_tpu.parallel.pipeline import shard_llama_params_pp
    from quantizations_tpu.parallel.shard import shard_llama_params

    cfg = dataclasses.replace(TINY_LLAMA, num_hidden_layers=2)
    fused = fuse_projections(init_llama_params(cfg, seed=0))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("tp",))
    with pytest.raises(ValueError, match="UNFUSED"):
        shard_llama_params(fused, mesh, cfg)
    mesh_pp = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    with pytest.raises(ValueError, match="UNFUSED"):
        shard_llama_params_pp(fused, mesh_pp, cfg)


@pytest.mark.parametrize("knobs", [
    dict(spec_k=3),
    dict(steps_per_dispatch=2),
    dict(spec_k=2, steps_per_dispatch=2),
])
def test_fused_paged_compositions_match_unfused(knobs):
    """Fusion must compose with the paged engine's speculative verify
    windows (q_span through the fused qkv) and multi-step dispatch."""
    from quantizations_tpu.serve.paged import PagedEngine

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    prompt = PROMPT * 2 + PROMPT[:3]   # repetition feeds prompt-lookup

    def run(p):
        eng = PagedEngine(p, cfg, num_pages=16, page_size=16, slots=2,
                          max_seq=64, prefill_buckets=(8,))
        u = eng.submit(prompt, max_new_tokens=8)
        return eng.run(**knobs)[u].output_ids

    assert run(fuse_projections(params)) == run(params)


def test_fused_int8_kv_matches_unfused():
    cfg = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")
    params = init_llama_params(cfg, seed=0)
    ref = _greedy(params, cfg)
    got = _greedy(fuse_projections(params), cfg)
    assert got == ref, (got, ref)


def test_tp_fused_generate_matches_unfused():
    """fuse_projections_tp: per-shard local concat under shard_map —
    the TP generate loop streams token-identical to the unfused
    sharded program (and to single-device)."""
    from jax.sharding import NamedSharding
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.parallel import make_mesh
    from quantizations_tpu.parallel.shard import (
        cache_pspec, fuse_projections_tp, make_sharded_generate_fn,
        shard_llama_params)

    cfg = dataclasses.replace(TINY_LLAMA, attention_bias=True)
    params = init_llama_params(cfg, seed=0)
    mesh = make_mesh((2,), ("tp",))
    serve = ServeConfig(max_seq_len=48, max_new_tokens=6,
                        temperature=0.0, donate_cache=False)
    ids = jnp.asarray([PROMPT], jnp.int32)
    key = jax.random.PRNGKey(0)

    def shard_cache():
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            KVCache.create(cfg, 1, 48), cache_pspec(cfg))

    sharded = shard_llama_params(params, mesh, cfg)
    ref, _ = make_sharded_generate_fn(cfg, serve, mesh)(
        sharded, ids, shard_cache(), key)

    fused = fuse_projections_tp(sharded, mesh, cfg)
    assert fused.layers.q is None and fused.layers.qkv_bias is not None
    toks, _ = make_sharded_generate_fn(cfg, serve, mesh, fused=True)(
        fused, ids, shard_cache(), key)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    assert fuse_projections_tp(fused, mesh, cfg) is fused


def test_tp_fused_engines_match_unfused():
    """Engine(mesh=) and PagedEngine(mesh=) accept fuse_projections_tp
    params (fused pspecs) and stream identical tokens."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.parallel import make_mesh
    from quantizations_tpu.parallel.shard import (fuse_projections_tp,
                                                  shard_llama_params)
    from quantizations_tpu.serve.engine import Engine
    from quantizations_tpu.serve.paged import PagedEngine

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    mesh = make_mesh((2,), ("tp",))
    sharded = shard_llama_params(params, mesh, cfg)
    fused = fuse_projections_tp(sharded, mesh, cfg)
    serve = ServeConfig(max_seq_len=48)

    def run_slot(p):
        eng = Engine(p, cfg, serve, slots=2, prefill_buckets=(8,),
                     mesh=mesh)
        u = eng.submit(PROMPT, max_new_tokens=6)
        return eng.run()[u].output_ids

    def run_paged(p):
        eng = PagedEngine(p, cfg, num_pages=16, page_size=16, slots=2,
                          max_seq=48, prefill_buckets=(8,), mesh=mesh)
        u = eng.submit(PROMPT, max_new_tokens=6)
        return eng.run()[u].output_ids

    assert run_slot(fused) == run_slot(sharded)
    assert run_paged(fused) == run_paged(sharded)
