"""Mesh/collective tests on the simulated 8-device CPU platform
(SURVEY.md §4 config 5). The TP-sharded generate must produce the same
tokens — and near-identical logits — as the single-device path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache,
    TINY_LLAMA,
    init_llama_params,
    prefill,
)
from quantizations_tpu.parallel import (
    make_mesh,
    make_sharded_generate_fn,
    shard_llama_params,
)
from quantizations_tpu.parallel.shard import cache_pspec, validate_tp
from quantizations_tpu.serve.generate import make_generate_fn

CFG = TINY_LLAMA
MAX_SEQ = 32


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, seed=0)


def _sharded_cache(mesh, batch):
    from jax.sharding import NamedSharding

    cache = KVCache.create(CFG, batch, MAX_SEQ)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache, cache_pspec(),
    )


@pytest.mark.parametrize("tp", [2, 8])
def test_tp_generate_matches_single_device(params, tp):
    if len(jax.devices()) < tp:
        pytest.skip(f"needs {tp} devices")
    validate_tp(CFG, tp)
    mesh = make_mesh((tp,), ("tp",))

    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_gen = make_generate_fn(CFG, serve)
    ref_toks, _ = ref_gen(params, ids, KVCache.create(CFG, 1, MAX_SEQ), key)

    sharded = shard_llama_params(params, mesh, CFG)
    gen = make_sharded_generate_fn(CFG, serve, mesh)
    toks, cache = gen(sharded, ids, _sharded_cache(mesh, 1), key)

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


@pytest.mark.parametrize("knobs", [
    dict(sliding_window=6),                               # Mistral
    dict(sliding_window=6, sliding_layers="even",         # Gemma-2
         post_norms=True, norm_plus_one=True,
         hidden_activation="gelu_tanh", embed_normalizer=True,
         attn_logit_softcap=50.0, final_logit_softcap=30.0,
         query_scale=24),
    dict(qk_norm=True),                                   # Qwen3
])
def test_tp_generate_family_knobs(knobs):
    """Family-knob configs (sliding window / Gemma-2 / Qwen3) must be
    token-identical through the TP-sharded generate — incl. the knob
    param leaves (post norms, q/k norms) in the pspec pytree."""
    import dataclasses

    cfg = dataclasses.replace(TINY_LLAMA, **knobs)
    validate_tp(cfg, 2)
    p = init_llama_params(cfg, seed=0)
    mesh = make_mesh((2,), ("tp",))
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_toks, _ = make_generate_fn(cfg, serve)(
        p, ids, KVCache.create(cfg, 1, MAX_SEQ), key)

    from jax.sharding import NamedSharding

    sharded = shard_llama_params(p, mesh, cfg)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(cfg, 1, MAX_SEQ), cache_pspec())
    toks, _ = make_sharded_generate_fn(cfg, serve, mesh)(
        sharded, ids, cache, key)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_tp_prefill_logits_close(params):
    """Direct logits comparison single-device vs tp=4 shard_map."""
    tp = 4
    if len(jax.devices()) < tp:
        pytest.skip("needs 4 devices")
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((tp,), ("tp",))
    ids = jnp.asarray([[2, 7, 1, 8]], jnp.int32)

    ref_logits, _ = jax.jit(functools.partial(prefill, cfg=CFG))(
        params, ids, KVCache.create(CFG, 1, MAX_SEQ))

    from quantizations_tpu.parallel.shard import llama_param_pspecs

    sharded = shard_llama_params(params, mesh, CFG)
    body = functools.partial(prefill, cfg=CFG, axis_name="tp")
    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(llama_param_pspecs(CFG), P(None, None), cache_pspec()),
        out_specs=(P(None, None, None), cache_pspec()),
        check_vma=False,
    ))
    logits, _ = fn(sharded, ids, _sharded_cache(mesh, 1))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=0, atol=2e-2)


def test_tp_overlap_chunks_token_identical(params):
    """The chunked row-parallel psum (collective/compute overlap,
    tp_overlap_chunks > 1) emits the SAME tokens as the single-psum
    program — chunking the output axis changes neither per-row math
    nor communication volume."""
    import dataclasses

    tp = 4
    if len(jax.devices()) < tp:
        pytest.skip("needs 4 devices")
    validate_tp(CFG, tp)
    mesh = make_mesh((tp,), ("tp",))
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=6,
                        temperature=0.0, donate_cache=False)
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    key = jax.random.PRNGKey(0)
    sharded = shard_llama_params(params, mesh, CFG)

    base = make_sharded_generate_fn(CFG, serve, mesh)
    ref_toks, _ = base(sharded, ids, _sharded_cache(mesh, 1), key)

    cfg_ov = dataclasses.replace(CFG, tp_overlap_chunks=4)
    gen = make_sharded_generate_fn(cfg_ov, serve, mesh)
    toks, _ = gen(sharded, ids, _sharded_cache(mesh, 1), key)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))

    # non-divisible chunk counts fall back to the single psum
    cfg_bad = dataclasses.replace(CFG, tp_overlap_chunks=7)
    gen_b = make_sharded_generate_fn(cfg_bad, serve, mesh)
    toks_b, _ = gen_b(sharded, ids, _sharded_cache(mesh, 1), key)
    np.testing.assert_array_equal(np.asarray(toks_b), np.asarray(ref_toks))


def test_dp_tp_generate_matches_single_device():
    """(dp=2, tp=4) sharded generate: batch rows split over dp, each
    replica runs the TP decode — tokens equal the single-device run."""
    import dataclasses

    from quantizations_tpu.config import QuantConfig, ServeConfig
    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params)
    from quantizations_tpu.parallel.multihost import (
        make_dp_tp_generate_fn, make_dp_tp_mesh)
    from quantizations_tpu.parallel.shard import shard_llama_params
    from quantizations_tpu.serve.generate import make_generate_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = TINY_LLAMA
    serve = ServeConfig(max_seq_len=48, max_new_tokens=6, temperature=0.0)
    params = init_llama_params(cfg, seed=0)
    ids = jnp.asarray([[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]], jnp.int32)

    gen1 = make_generate_fn(cfg, serve)
    ref = np.asarray(gen1(params, ids, KVCache.create(cfg, 2, 48),
                          jax.random.PRNGKey(0))[0])

    mesh = make_dp_tp_mesh(tp=4)
    sparams = shard_llama_params(params, mesh, cfg)
    gen = make_dp_tp_generate_fn(cfg, serve, mesh)
    toks = np.asarray(gen(sparams, ids, KVCache.create(cfg, 2, 48),
                          jax.random.PRNGKey(0))[0])
    np.testing.assert_array_equal(toks, ref)
