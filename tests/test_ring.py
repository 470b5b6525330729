"""Ring attention (SP/CP): sequence-sharded causal attention equals the
dense single-device computation (CPU mesh sim, 8 virtual devices)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from quantizations_tpu.parallel.ring import (
    make_ring_attention_fn, ring_attention)


def dense_causal(q, k, v):
    B, T, KVH, G, D = q.shape
    qf = q.astype(np.float64) * (D ** -0.5)
    sc = np.einsum("bqkgd,bskd->bqkgs", qf, k.astype(np.float64))
    mask = np.tril(np.ones((T, T), bool))
    sc = np.where(mask[None, :, None, None, :], sc, -np.inf)
    p = np.exp(sc - sc.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bqkgs,bskd->bqkgd", p, v.astype(np.float64))


@pytest.mark.parametrize("n,T", [(2, 16), (4, 32), (8, 64)])
def test_ring_attention_matches_dense(n, T):
    rng = np.random.default_rng(0)
    B, KVH, G, D = 2, 2, 2, 16
    q = rng.standard_normal((B, T, KVH, G, D)).astype(np.float32)
    k = rng.standard_normal((B, T, KVH, D)).astype(np.float32)
    v = rng.standard_normal((B, T, KVH, D)).astype(np.float32)

    mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
    f = make_ring_attention_fn(mesh, "sp")
    out = np.asarray(f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = dense_causal(q, k, v)
    # fp32 summation-order noise only (abs ~1e-6 on near-zero elements)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=5e-6)
    # at bf16 (the model's activation dtype) at most rounding-boundary
    # flips survive: any mismatch must be a single-ULP neighbor pair
    a = np.asarray(jnp.asarray(out, jnp.bfloat16)).view(np.uint16)
    b = np.asarray(jnp.asarray(ref.astype(np.float32), jnp.bfloat16)).view(
        np.uint16)
    ulp = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert ulp.max() <= 1 and (ulp != 0).mean() < 1e-3


@pytest.mark.parametrize("n", [2, 4])
def test_sp_prefill_matches_single_device(n):
    """Sequence-parallel prefill == single-device prefill: same filled
    cache, same last-token logits, same greedy continuation."""
    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, decode_step, init_llama_params, prefill)
    from quantizations_tpu.parallel.ring import make_sp_prefill_fn

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    T, B, MAX_SEQ = 16, 2, 32
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (B, T)),
        jnp.int32)

    ref_logits, ref_cache = prefill(
        params, ids, KVCache.create(cfg, B, MAX_SEQ), cfg,
        last_token_only=True)

    mesh = Mesh(np.asarray(jax.devices()[:n]), ("sp",))
    f = make_sp_prefill_fn(mesh, cfg)
    sp_logits, sp_cache = f(params, ids, KVCache.create(cfg, B, MAX_SEQ))

    # layer 0 K is bit-identical (same math, no attention upstream);
    # deeper layers pick up bf16-ULP noise from the ring's different
    # fp32 summation order in layer 0's attention output
    np.testing.assert_array_equal(
        np.asarray(sp_cache.k[0, :, :, :T].astype(jnp.float32)),
        np.asarray(ref_cache.k[0, :, :, :T].astype(jnp.float32)))
    np.testing.assert_allclose(
        np.asarray(sp_cache.k[:, :, :, :T].astype(jnp.float32)),
        np.asarray(ref_cache.k[:, :, :, :T].astype(jnp.float32)),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits[:, 0]),
        rtol=2e-2, atol=2e-2)
    assert (np.argmax(np.asarray(sp_logits), -1)
            == np.argmax(np.asarray(ref_logits[:, 0]), -1)).all()

    # greedy continuation from each cache agrees
    nxt = jnp.argmax(sp_logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B,), T, jnp.int32)
    l1, _ = decode_step(params, nxt, sp_cache, pos, cfg)
    l2, _ = decode_step(params, nxt, ref_cache, pos, cfg)
    assert (np.argmax(np.asarray(l1), -1)
            == np.argmax(np.asarray(l2), -1)).all()


def test_sp_tp_prefill_matches_single_device():
    """2D (sp=2, tp=2) mesh: ring prefill over TP-sharded params equals
    the single-device prefill (greedy logits + filled cache)."""
    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params, prefill)
    from quantizations_tpu.parallel.ring import make_sp_prefill_fn
    from quantizations_tpu.parallel.shard import (
        cache_pspec, shard_llama_params)
    from jax.sharding import NamedSharding

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    T, B, MAX_SEQ = 16, 2, 32
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (B, T)),
        jnp.int32)

    ref_logits, ref_cache = prefill(
        params, ids, KVCache.create(cfg, B, MAX_SEQ), cfg,
        last_token_only=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("sp", "tp"))
    sp_params = shard_llama_params(params, mesh, cfg)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(cfg, B, MAX_SEQ), cache_pspec())
    f = make_sp_prefill_fn(mesh, cfg, tp_axis="tp")
    sp_logits, sp_cache = f(sp_params, ids, cache)

    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits[:, 0]),
        rtol=2e-2, atol=2e-2)
    assert (np.argmax(np.asarray(sp_logits), -1)
            == np.argmax(np.asarray(ref_logits[:, 0]), -1)).all()
    np.testing.assert_allclose(
        np.asarray(sp_cache.k[:, :, :, :T].astype(jnp.float32)),
        np.asarray(ref_cache.k[:, :, :, :T].astype(jnp.float32)),
        rtol=2e-2, atol=2e-2)


def test_sp_prefill_sliding_window_matches_single_device():
    """Mistral-style sliding window through the ring mask (window
    smaller than a chunk exercises the sub-chunk masking)."""
    import dataclasses

    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params, prefill)
    from quantizations_tpu.parallel.ring import make_sp_prefill_fn

    cfg = dataclasses.replace(TINY_LLAMA, sliding_window=5)
    params = init_llama_params(cfg, seed=0)
    T, B, MAX_SEQ = 16, 2, 32
    ids = jnp.asarray(
        np.random.default_rng(4).integers(0, cfg.vocab_size, (B, T)),
        jnp.int32)

    ref_logits, _ = prefill(
        params, ids, KVCache.create(cfg, B, MAX_SEQ), cfg,
        last_token_only=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    f = make_sp_prefill_fn(mesh, cfg)
    sp_logits, _ = f(params, ids, KVCache.create(cfg, B, MAX_SEQ))
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits[:, 0]),
        rtol=2e-2, atol=2e-2)
    assert (np.argmax(np.asarray(sp_logits), -1)
            == np.argmax(np.asarray(ref_logits[:, 0]), -1)).all()


@pytest.mark.parametrize("family", ["gemma2", "qwen3"])
def test_sp_prefill_family_knobs_match_single_device(family):
    """Gemma-2 (sandwich norms, softcaps, alternating window, GeGLU,
    embed normalizer) and Qwen3 (qk-norm) through the ring trunk."""
    import dataclasses

    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params, prefill)
    from quantizations_tpu.parallel.ring import make_sp_prefill_fn

    if family == "gemma2":
        cfg = dataclasses.replace(
            TINY_LLAMA, hidden_activation="gelu_tanh", post_norms=True,
            norm_plus_one=True, embed_normalizer=True,
            attn_logit_softcap=50.0, final_logit_softcap=30.0,
            query_scale=48.0, sliding_window=5, sliding_layers="even")
    else:
        cfg = dataclasses.replace(TINY_LLAMA, qk_norm=True)
    params = init_llama_params(cfg, seed=0)
    T, B, MAX_SEQ = 16, 2, 32
    ids = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (B, T)),
        jnp.int32)

    ref_logits, _ = prefill(
        params, ids, KVCache.create(cfg, B, MAX_SEQ), cfg,
        last_token_only=True)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    f = make_sp_prefill_fn(mesh, cfg)
    sp_logits, _ = f(params, ids, KVCache.create(cfg, B, MAX_SEQ))
    # the softcap tanh + (1+w) norms amplify bf16 reorder noise a bit
    # beyond the plain-Llama tolerance
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits[:, 0]),
        rtol=5e-2, atol=5e-2)
    assert (np.argmax(np.asarray(sp_logits), -1)
            == np.argmax(np.asarray(ref_logits[:, 0]), -1)).all()


def test_ring_attention_single_device_degenerates():
    """n=1: the ring is just dense causal attention (no ppermute)."""
    rng = np.random.default_rng(1)
    B, T, KVH, G, D = 1, 8, 1, 2, 8
    q = jnp.asarray(rng.standard_normal((B, T, KVH, G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, KVH, D)), jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    out = np.asarray(make_ring_attention_fn(mesh, "sp")(q, k, v))
    ref = dense_causal(np.asarray(q), np.asarray(k), np.asarray(v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sp_prefill_int8_matches_single_device():
    """int8 KV through SP ring prefill (VERDICT r2 #5): the ring
    quantizes-on-write like the dense path and attends the dequantized
    K/V, so the filled int8 cache (codes AND step planes) agrees with
    the single-device int8 prefill and the greedy continuation
    matches."""
    import dataclasses

    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, decode_step, init_llama_params, prefill)
    from quantizations_tpu.parallel.ring import make_sp_prefill_fn

    cfg = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    params = init_llama_params(cfg, seed=0)
    T, B, MAX_SEQ = 16, 2, 32
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (B, T)),
        jnp.int32)

    ref_logits, ref_cache = prefill(
        params, ids, KVCache.create(cfg, B, MAX_SEQ), cfg,
        last_token_only=True)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("sp",))
    f = make_sp_prefill_fn(mesh, cfg)
    sp_logits, sp_cache = f(params, ids,
                            KVCache.create(cfg, B, MAX_SEQ))
    assert sp_cache.k.dtype == jnp.int8
    assert sp_cache.k_scale is not None

    # layer 0 codes + steps bit-identical (same quantize math, no
    # attention upstream)
    np.testing.assert_array_equal(
        np.asarray(sp_cache.k[0, :, :, :T]),
        np.asarray(ref_cache.k[0, :, :, :T]))
    np.testing.assert_array_equal(
        np.asarray(sp_cache.k_scale[0, :, :, :T].astype(jnp.float32)),
        np.asarray(ref_cache.k_scale[0, :, :, :T].astype(jnp.float32)))
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits[:, 0]),
        rtol=2e-2, atol=2e-2)
    assert (np.argmax(np.asarray(sp_logits), -1)
            == np.argmax(np.asarray(ref_logits[:, 0]), -1)).all()

    nxt = jnp.argmax(sp_logits, -1).astype(jnp.int32)[:, None]
    pos = jnp.full((B,), T, jnp.int32)
    l1, _ = decode_step(params, nxt, sp_cache, pos, cfg)
    l2, _ = decode_step(params, nxt, ref_cache, pos, cfg)
    assert (np.argmax(np.asarray(l1), -1)
            == np.argmax(np.asarray(l2), -1)).all()
