"""int8 KV cache (quantize-on-write, per-token absmax steps): numerics
vs the bf16 cache on the CPU sim. Opt-in via
``LlamaConfig.kv_cache_dtype="int8"``."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache, TINY_LLAMA, init_llama_params, prefill)
from quantizations_tpu.serve.generate import make_generate_fn

CFG8 = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")


@pytest.fixture(scope="module")
def params():
    return init_llama_params(TINY_LLAMA, seed=0)


def test_create_shapes():
    c = KVCache.create(CFG8, 2, 32)
    assert c.k.dtype == jnp.int8 and c.k_scale.dtype == jnp.bfloat16
    assert c.k_scale.shape == c.k.shape[:4]
    cb = KVCache.create(TINY_LLAMA, 2, 32)
    assert cb.k.dtype == jnp.bfloat16 and cb.k_scale is None


def test_prefill_roundtrip_error_bounded(params):
    """Dequantized int8 K is within half a quantization step of the
    bf16-cache K for every written position."""
    T, B = 12, 2
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, TINY_LLAMA.vocab_size, (B, T)),
        jnp.int32)
    _, cb = prefill(params, ids, KVCache.create(TINY_LLAMA, B, 32),
                    TINY_LLAMA, last_token_only=True)
    _, c8 = prefill(params, ids, KVCache.create(CFG8, B, 32), CFG8,
                    last_token_only=True)
    # layer 0 only: deeper layers see different inputs (the int8 run's
    # layer-0 attention output already carries quantization noise), so
    # only layer 0 is a pure write-path roundtrip
    kq = (np.asarray(c8.k[0, :, :, :T], np.float32)
          * np.asarray(c8.k_scale[0, :, :, :T], np.float32)[..., None])
    kb = np.asarray(cb.k[0, :, :, :T], np.float32)
    step = np.asarray(c8.k_scale[0, :, :, :T], np.float32)[..., None]
    # half-step quantization error (codes are computed against the
    # bf16-rounded step, so write/read are consistent) + kb's own bf16
    # rounding
    assert np.all(
        np.abs(kq - kb) <= 0.5 * step + 0.005 * np.abs(kb) + 1e-6)


def test_greedy_generate_matches_bf16(params):
    """Greedy token streams with the int8 cache match the bf16 cache on
    the tiny model (int8 KV noise ≪ logit margins)."""
    serve = ServeConfig(max_seq_len=64, max_new_tokens=16,
                        temperature=0.0, donate_cache=False)
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    key = jax.random.PRNGKey(0)
    tb, _ = make_generate_fn(TINY_LLAMA, serve)(
        params, ids, KVCache.create(TINY_LLAMA, 1, 64), key)
    t8, c8 = make_generate_fn(CFG8, serve)(
        params, ids, KVCache.create(CFG8, 1, 64), key)
    agree = (np.asarray(tb) == np.asarray(t8)).mean()
    assert agree >= 0.875, (tb.tolist(), t8.tolist())
    assert c8.k.dtype == jnp.int8


def test_engine_with_int8_cache(params):
    """Engine serves from an int8 slot cache (scratch insert threads the
    scale planes); greedy streams match the plain int8 generate."""
    from quantizations_tpu.serve.engine import Engine

    serve = ServeConfig(max_seq_len=48, max_new_tokens=6,
                        temperature=0.0, donate_cache=False)
    prompt = [3, 1, 4, 1, 5]
    gen = make_generate_fn(CFG8, serve)
    ref, _ = gen(params, jnp.asarray([prompt], jnp.int32),
                 KVCache.create(CFG8, 1, 48), jax.random.PRNGKey(0))

    eng = Engine(params, CFG8, serve, slots=2, prefill_buckets=(8, 16))
    uid = eng.submit(prompt, max_new_tokens=6)
    done = eng.run()
    assert done[uid].done
    assert done[uid].output_ids == list(np.asarray(ref)[0])


def test_flash_decode_i8_matches_dequant_reference():
    """Interpret-mode int8 flash kernel == dequantize-then-attend."""
    from quantizations_tpu.ops.attention import (
        flash_decode_attention_stacked_i8)

    rng = np.random.default_rng(7)
    L, B, KVH, G, D, S = 3, 2, 2, 4, 128, 512
    kf = rng.standard_normal((L, B, KVH, S, D)).astype(np.float32)
    vf = rng.standard_normal((L, B, KVH, S, D)).astype(np.float32)
    step_k = np.abs(kf).max(-1) / 127.0
    step_v = np.abs(vf).max(-1) / 127.0
    ki = np.clip(np.round(kf / step_k[..., None]), -127, 127).astype(np.int8)
    vi = np.clip(np.round(vf / step_v[..., None]), -127, 127).astype(np.int8)
    sk = step_k.astype(jnp.bfloat16)
    sv = step_v.astype(jnp.bfloat16)
    q = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
    lengths = np.asarray([S, S // 2], np.int32)
    li = 1

    out = np.asarray(flash_decode_attention_stacked_i8(
        jnp.asarray(q), jnp.asarray(ki), jnp.asarray(vi),
        jnp.asarray(sk), jnp.asarray(sv), jnp.int32(li),
        jnp.asarray(lengths), interpret=True))

    # reference: dequant with the same bf16 steps, plain softmax attend
    kd = ki[li].astype(np.float32) * np.asarray(
        sk[li], np.float32)[..., None]
    vd = vi[li].astype(np.float32) * np.asarray(
        sv[li], np.float32)[..., None]
    ref = np.zeros_like(out)
    for b in range(B):
        n = lengths[b]
        s = np.einsum("kgd,ksd->kgs", q[b] * D ** -0.5, kd[b, :, :n])
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[b] = np.einsum("kgs,ksd->kgd", p, vd[b, :, :n])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_flash_decode_i8_window_softcap():
    """int8 flash kernel with a traced sliding window + static softcap
    == dequantize-then-attend with the same masking."""
    from quantizations_tpu.ops.attention import (
        flash_decode_attention_stacked_i8)

    rng = np.random.default_rng(9)
    L, B, KVH, G, D, S = 2, 2, 1, 4, 128, 256
    W, CAP = 64, 50.0
    kf = rng.standard_normal((L, B, KVH, S, D)).astype(np.float32)
    vf = rng.standard_normal((L, B, KVH, S, D)).astype(np.float32)
    step_k = np.abs(kf).max(-1) / 127.0
    step_v = np.abs(vf).max(-1) / 127.0
    ki = np.clip(np.round(kf / step_k[..., None]), -127, 127).astype(np.int8)
    vi = np.clip(np.round(vf / step_v[..., None]), -127, 127).astype(np.int8)
    sk = step_k.astype(jnp.bfloat16)
    sv = step_v.astype(jnp.bfloat16)
    q = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
    lengths = np.asarray([S, 100], np.int32)
    li = 0

    out = np.asarray(flash_decode_attention_stacked_i8(
        jnp.asarray(q), jnp.asarray(ki), jnp.asarray(vi),
        jnp.asarray(sk), jnp.asarray(sv), jnp.int32(li),
        jnp.asarray(lengths), interpret=True,
        softcap=CAP, window=jnp.int32(W)))

    kd = ki[li].astype(np.float32) * np.asarray(
        sk[li], np.float32)[..., None]
    vd = vi[li].astype(np.float32) * np.asarray(
        sv[li], np.float32)[..., None]
    ref = np.zeros_like(out)
    for b in range(B):
        n = lengths[b]
        lo = max(n - W, 0)     # attend iff (n-1) - s < W  <=>  s >= n-W
        s = np.einsum("kgd,ksd->kgs", q[b] * D ** -0.5, kd[b, :, lo:n])
        s = CAP * np.tanh(s / CAP)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[b] = np.einsum("kgs,ksd->kgd", p, vd[b, :, lo:n])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_greedy_generate_matches_bf16_flash(params):
    """int8 + use_flash_attention runs the i8 kernel end-to-end
    (interpret on CPU) and still matches the bf16-cache stream."""
    cfg8f = dataclasses.replace(CFG8, use_flash_attention=True)
    serve = ServeConfig(max_seq_len=64, max_new_tokens=8,
                        temperature=0.0, donate_cache=False)
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    key = jax.random.PRNGKey(0)
    tb, _ = make_generate_fn(TINY_LLAMA, serve)(
        params, ids, KVCache.create(TINY_LLAMA, 1, 64), key)
    t8, _ = make_generate_fn(cfg8f, serve)(
        params, ids, KVCache.create(cfg8f, 1, 64), key)
    agree = (np.asarray(tb) == np.asarray(t8)).mean()
    assert agree >= 0.875, (tb.tolist(), t8.tolist())


def test_engine_spec_with_int8_cache(params):
    """Speculative windows over the int8 slot cache (T=K quantized
    writes per window): stream matches the plain int8 engine."""
    from quantizations_tpu.serve.engine import Engine

    serve = ServeConfig(max_seq_len=48)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    eng_p = Engine(params, CFG8, serve, slots=2, prefill_buckets=(8,))
    u_p = eng_p.submit(prompt, max_new_tokens=10)
    ref = eng_p.run()[u_p].output_ids

    eng_s = Engine(params, CFG8, serve, slots=2, prefill_buckets=(8,))
    u_s = eng_s.submit(prompt, max_new_tokens=10)
    got = eng_s.run(spec_k=4)[u_s].output_ids
    assert got == ref


def test_parallel_factories_accept_int8():
    """Round 3 removed the round-2 bf16 gates: int8 KV now composes
    with TP (scale planes shard on the kv-head axis) and the SP ring
    (in-ring quantize-on-write) — the factories must ACCEPT int8
    configs. Token-identity is covered by test_int8_tp.py /
    test_ring.py / test_pipeline.py."""
    from quantizations_tpu.parallel.ring import make_sp_prefill_fn
    from quantizations_tpu.parallel.shard import validate_tp
    from jax.sharding import Mesh

    validate_tp(CFG8, 2)     # no raise
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("sp",))
    make_sp_prefill_fn(mesh, CFG8)   # no raise
