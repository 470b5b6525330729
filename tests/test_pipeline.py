"""Pipeline-parallel generate (simulated mesh) vs single-device
reference — stage-sharded layers + microbatched ticks must be
token-identical."""

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
from quantizations_tpu.parallel.pipeline import (
    make_pp_generate_fn,
    pp_cache_pspec,
    shard_llama_params_pp,
)
from quantizations_tpu.serve.generate import make_generate_fn

CFG = TINY_LLAMA
MAX_SEQ = 32


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_generate_matches_single_device(pp):
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} devices")
    import dataclasses

    from jax.sharding import Mesh, NamedSharding

    global CFG
    CFG = dataclasses.replace(TINY_LLAMA, num_hidden_layers=pp)
    params = init_llama_params(CFG, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    B = pp * 2
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, 4)), jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_gen = make_generate_fn(CFG, serve)
    ref_toks, _ = ref_gen(params, ids, KVCache.create(CFG, B, MAX_SEQ), key)

    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
    sharded = shard_llama_params_pp(params, mesh, CFG)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(CFG, B, MAX_SEQ), pp_cache_pspec())
    gen = make_pp_generate_fn(CFG, serve, mesh)
    toks, _ = gen(sharded, ids, cache, key)

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


@pytest.mark.parametrize("pp,tp", [(2, 2), (2, 4)])
def test_pp_tp_generate_matches_single_device(pp, tp):
    """2D (pp, tp) mesh: stage-sharded + Megatron-sharded layers,
    token-identical to single device."""
    if len(jax.devices()) < pp * tp:
        pytest.skip(f"needs {pp * tp} devices")
    import dataclasses

    from jax.sharding import Mesh, NamedSharding

    cfg = dataclasses.replace(TINY_LLAMA, num_hidden_layers=pp)
    params = init_llama_params(cfg, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    B = pp * 2
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 4)), jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_gen = make_generate_fn(cfg, serve)
    ref_toks, _ = ref_gen(params, ids, KVCache.create(cfg, B, MAX_SEQ), key)

    mesh = Mesh(np.asarray(jax.devices()[:pp * tp]).reshape(pp, tp),
                ("pp", "tp"))
    sharded = shard_llama_params_pp(params, mesh, cfg, tp_axis="tp")
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(cfg, B, MAX_SEQ), pp_cache_pspec("tp"))
    gen = make_pp_generate_fn(cfg, serve, mesh, tp_axis="tp")
    toks, _ = gen(sharded, ids, cache, key)

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


@pytest.mark.parametrize("knobs", [
    dict(sliding_window=6),                               # Mistral
    dict(sliding_window=6, sliding_layers="even",         # Gemma-2 —
         post_norms=True, norm_plus_one=True,             # alternation
         hidden_activation="gelu_tanh", embed_normalizer=True,  # crosses
         attn_logit_softcap=50.0, final_logit_softcap=30.0,     # the
         query_scale=24),                                 # stage boundary
    dict(qk_norm=True),                                   # Qwen3
])
def test_pp_generate_family_knobs(knobs):
    """Family knobs through PP: the per-layer window alternation must
    use the GLOBAL layer index (stage * L_local + i), and the embed
    normalizer / final softcap must ride the pipelined forward.

    max_new_tokens=4: at token 5 the qk_norm config hits a measured
    greedy near-tie (top-2 logit gap 1.5e-3 on ids 754/357, row 1)
    that bf16 reduction-order differences across the pipelined
    microbatching legitimately flip — exact token equality is only a
    sound oracle away from ties. Scales are pinned fp32 for the same
    reason: the bf16-scales class hits another near-tie (gap 1.3e-3,
    row 2 ids 65/476 under sliding_window=6) that PP's reduction order
    flips."""
    import dataclasses

    from jax.sharding import Mesh, NamedSharding

    from quantizations_tpu.config import QuantConfig

    pp = 2
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} devices")
    cfg = dataclasses.replace(
        TINY_LLAMA, num_hidden_layers=4,
        quant=QuantConfig(scales_dtype=jnp.float32), **knobs)
    params = init_llama_params(cfg, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=4,
                        temperature=0.0, donate_cache=False)
    B = pp * 2
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 8)), jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_toks, _ = make_generate_fn(cfg, serve)(
        params, ids, KVCache.create(cfg, B, MAX_SEQ), key)

    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
    sharded = shard_llama_params_pp(params, mesh, cfg)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(cfg, B, MAX_SEQ), pp_cache_pspec())
    toks, _ = make_pp_generate_fn(cfg, serve, mesh)(
        sharded, ids, cache, key)

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_pp_generate_int8_matches_single_device():
    """int8 KV through PP (VERDICT r2 #5): the dequant-step planes ride
    the same microbatch cache slices, so PP streams stay
    token-identical to the single-device int8 generate."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import dataclasses

    from jax.sharding import Mesh, NamedSharding

    cfg = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")
    params = init_llama_params(cfg, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    B = 4
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 4)), jnp.int32)
    key = jax.random.PRNGKey(0)

    ref_gen = make_generate_fn(cfg, serve)
    ref_toks, _ = ref_gen(params, ids, KVCache.create(cfg, B, MAX_SEQ),
                          key)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    sharded = shard_llama_params_pp(params, mesh, cfg)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(cfg, B, MAX_SEQ), pp_cache_pspec(cfg=cfg))
    gen = make_pp_generate_fn(cfg, serve, mesh)
    toks, cache_out = gen(sharded, ids, cache, key)
    assert cache_out.k.dtype == jnp.int8
    assert cache_out.k_scale is not None

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))
