"""scales_dtype="bf16x2": merged bf16 row-pair scale words (int32
[M/2, NB]) — the pair kernels' own in-kernel storage form, at half the
fp32 scale bytes with ZERO per-step transform.

Numerics claim under test: the pair kernels already round scales to
bf16 in-kernel (ops/qmatmul._scale_pairs), so packed bf16x2 storage is
BIT-IDENTICAL to fp32 storage on the pair kernel path (asserted exact
in interpret mode here; on-chip via benchmarks/onchip_validation.py).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.ops.qmatmul import (
    pack_scale_pairs,
    planar_to_pair,
    unpack_scale_pairs,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _rand_pair(rng, M, K, L=None):
    shape = (M, K // 2) if L is None else (L, M, K // 2)
    by = jnp.asarray(
        rng.integers(0, 256, shape, dtype=np.int64).astype(np.int32))
    if L is None:
        return planar_to_pair(pack_i32_rows(by, M, K))
    return jnp.stack([planar_to_pair(pack_i32_rows(by[l], M, K))
                      for l in range(L)])


def test_pack_unpack_roundtrip(rng):
    for shape in [(8, 2), (128, 8), (3, 16, 4)]:
        s = jnp.asarray(rng.random(shape, np.float32) + 0.01)
        p = pack_scale_pairs(s)
        assert p.dtype == jnp.int32
        assert p.shape == (*shape[:-2], shape[-2] // 2, shape[-1])
        back = unpack_scale_pairs(p)
        assert back.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(back), np.asarray(s.astype(jnp.bfloat16),
                                         np.float32))


def test_pack_word_halves(rng):
    """Row 2i lands in the LOW 16 bits of word i (the layout
    pltpu.bitcast(bf16 [TM, NB], int32) produces in-kernel)."""
    s = jnp.asarray(rng.random((4, 2), np.float32))
    w = np.asarray(pack_scale_pairs(s)).astype(np.uint32)
    sb = np.asarray(s.astype(jnp.bfloat16))
    lo = (w & 0xFFFF).astype(np.uint16).view(np.void)  # raw halves
    for i in range(2):
        for b in range(2):
            word = int(w[i, b])
            lo16 = np.uint16(word & 0xFFFF).tobytes()
            hi16 = np.uint16((word >> 16) & 0xFFFF).tobytes()
            assert lo16 == sb[2 * i, b].tobytes()
            assert hi16 == sb[2 * i + 1, b].tobytes()


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_pair_kernel_packed_scales_bit_identical(rng, quant_type):
    """Grid pair kernel: packed bf16x2 scales == fp32 scales, exactly
    (the kernel rounds fp32 scales to bf16 in-kernel anyway)."""
    from quantizations_tpu.ops.qmatmul import matmul_4bit_pair_pallas

    M, K = 256, 512
    wp2 = _rand_pair(rng, M, K)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    packed = pack_scale_pairs(scales)
    for T in (1, 4):
        x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
        a = np.asarray(matmul_4bit_pair_pallas(
            wp2, packed, x, quant_type=quant_type, interpret=True))
        b = np.asarray(matmul_4bit_pair_pallas(
            wp2, scales, x, quant_type=quant_type, interpret=True))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_pair_stacked_packed_scales(rng, quant_type):
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_pallas, matmul_4bit_pair_pallas_stacked)

    M, K, L = 128, 256, 3
    wps = _rand_pair(rng, M, K, L)
    scales = jnp.asarray(rng.random((L, M, K // 64), np.float32))
    packed = pack_scale_pairs(scales)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    for l in (0, 2):
        a = np.asarray(matmul_4bit_pair_pallas_stacked(
            wps, packed, x, jnp.int32(l), quant_type=quant_type,
            interpret=True))
        b = np.asarray(matmul_4bit_pair_pallas(
            wps[l], scales[l], x, quant_type=quant_type, interpret=True))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_pair_manual_packed_scales(rng, quant_type):
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_manual, matmul_4bit_pair_manual_stacked,
        matmul_4bit_pair_pallas)

    M, K, L = 128, 256, 2
    wps = _rand_pair(rng, M, K, L)
    scales = jnp.asarray(rng.random((L, M, K // 64), np.float32))
    packed = pack_scale_pairs(scales)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    for l in range(L):
        ref = np.asarray(matmul_4bit_pair_pallas(
            wps[l], scales[l], x, quant_type=quant_type, interpret=True))
        a = np.asarray(matmul_4bit_pair_manual(
            wps[l], packed[l], x, quant_type=quant_type, interpret=True))
        np.testing.assert_array_equal(a, ref)
        s = np.asarray(matmul_4bit_pair_manual_stacked(
            wps, packed, x, jnp.int32(l), quant_type=quant_type,
            interpret=True))
        np.testing.assert_array_equal(s, ref)


def test_quantize_linear_bf16x2(rng):
    from quantizations_tpu.models.llama import quantize_linear

    W = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    ql = quantize_linear(W, scales_dtype="bf16x2")
    assert ql.scales_packed and ql.layout == "pair"
    assert ql.scales.dtype == jnp.int32
    assert ql.scales.shape == (16, 2)
    assert ql.out_features == 32 and ql.in_features == 128
    ref = quantize_linear(W)
    np.testing.assert_array_equal(
        np.asarray(unpack_scale_pairs(ql.scales)),
        np.asarray(ref.scales.astype(jnp.bfloat16), np.float32))
    # planar (row-sharded) weights fall back to fp32 scales
    pl_ = quantize_linear(W, scales_dtype="bf16x2", layout="planar")
    assert not pl_.scales_packed and pl_.scales.dtype == jnp.float32


def test_apply_4bit_packed_cpu_fallback(rng):
    """CPU/XLA fallback path: packed scales == bf16 scales exactly."""
    from quantizations_tpu.nn.linear import apply_4bit

    M, K = 32, 256
    wp2 = _rand_pair(rng, M, K)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    packed = pack_scale_pairs(scales)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    a = np.asarray(apply_4bit(x, wp2, packed, "fp4"))
    b = np.asarray(apply_4bit(x, wp2, scales.astype(jnp.bfloat16), "fp4"))
    np.testing.assert_array_equal(a, b)


def test_dense_weight_packed(rng):
    from quantizations_tpu.nn.linear import dense_weight

    M, K = 16, 128
    wp2 = _rand_pair(rng, M, K)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    a = np.asarray(dense_weight(wp2, pack_scale_pairs(scales),
                                "fp4", "pair"))
    b = np.asarray(dense_weight(
        wp2, jnp.asarray(np.asarray(scales.astype(jnp.bfloat16),
                                    np.float32)), "fp4", "pair"))
    np.testing.assert_array_equal(a, b)


def _tiny_cfg(scales_dtype):
    from quantizations_tpu.config import QuantConfig
    from quantizations_tpu.models.llama import TINY_LLAMA

    return dataclasses.replace(
        TINY_LLAMA, quant=QuantConfig(quant_type="fp4",
                                      scales_dtype=scales_dtype,
                                      quantize_embedding=True))


def test_model_bf16x2_matches_bf16_scales(rng):
    """Tiny model end-to-end on CPU: bf16x2 storage generates the same
    tokens as bf16 scale storage (same numerics class, packed form)."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.models.llama import KVCache, init_llama_params
    from quantizations_tpu.serve.generate import make_generate_fn

    serve = ServeConfig(max_seq_len=32, max_new_tokens=8, temperature=0.0)
    prompt = jnp.asarray([[3, 5, 7, 11]], jnp.int32)
    key = jax.random.PRNGKey(0)
    toks = []
    for sd in ("bf16x2", jnp.bfloat16):
        cfg = _tiny_cfg(sd)
        params = init_llama_params(cfg, seed=0)
        if sd == "bf16x2":
            assert params.layers.q.scales_packed
            assert params.layers.q.layout == "pair"
            # the gathered embedding keeps unpacked bf16 scales
            assert params.embed.scales.dtype == jnp.bfloat16
        gen = make_generate_fn(cfg, serve)
        cache = KVCache.create(cfg, 1, serve.max_seq_len)
        toks.append(np.asarray(gen(params, prompt, cache, key)[0]))
    np.testing.assert_array_equal(toks[0], toks[1])


def test_fuse_projections_packed(rng):
    """Serving-time qkv/gate_up fusion composes with packed scales:
    fused logits == unfused logits, bit-exact."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.models.llama import (
        KVCache, fuse_projections, init_llama_params)
    from quantizations_tpu.serve.generate import make_generate_fn

    cfg = _tiny_cfg("bf16x2")
    serve = ServeConfig(max_seq_len=32, max_new_tokens=6, temperature=0.0)
    params = init_llama_params(cfg, seed=0)
    fused = fuse_projections(params)
    assert fused.layers.qkv.scales_packed
    gen = make_generate_fn(cfg, serve)
    prompt = jnp.asarray([[2, 9, 4]], jnp.int32)
    key = jax.random.PRNGKey(1)
    a = np.asarray(gen(params, prompt,
                       KVCache.create(cfg, 1, serve.max_seq_len), key)[0])
    b = np.asarray(gen(fused, prompt,
                       KVCache.create(cfg, 1, serve.max_seq_len), key)[0])
    np.testing.assert_array_equal(a, b)


def test_tp_generate_bf16x2(rng):
    """TP sharding composes with packed scales: column-parallel shards
    keep the packed words (row axis shards through the word rows),
    row-parallel o/down repack to planar with widened fp32 scales
    (_ensure_planar), and the sharded generate reproduces the
    single-device bf16x2 tokens."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.models.llama import KVCache, init_llama_params
    from quantizations_tpu.parallel import (
        make_mesh, make_sharded_generate_fn, shard_llama_params)
    from quantizations_tpu.parallel.shard import cache_pspec
    from quantizations_tpu.serve.generate import make_generate_fn
    from jax.sharding import NamedSharding

    cfg = _tiny_cfg("bf16x2")
    serve = ServeConfig(max_seq_len=32, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    params = init_llama_params(cfg, seed=0)
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    key = jax.random.PRNGKey(0)
    ref_toks, _ = make_generate_fn(cfg, serve)(
        params, ids, KVCache.create(cfg, 1, serve.max_seq_len), key)

    mesh = make_mesh((2,), ("tp",))
    sharded = shard_llama_params(params, mesh, cfg)
    assert sharded.layers.q.scales_packed          # col-parallel: packed
    assert not sharded.layers.o.scales_packed      # row-parallel: fp32
    assert sharded.layers.o.scales.dtype == jnp.float32
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(cfg, 1, serve.max_seq_len), cache_pspec())
    toks, _ = make_sharded_generate_fn(cfg, serve, mesh)(
        sharded, ids, cache, key)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_ensure_planar_unpacks(rng):
    from quantizations_tpu.models.llama import quantize_linear
    from quantizations_tpu.parallel.shard import _ensure_planar

    W = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    ql = quantize_linear(W, scales_dtype="bf16x2")
    pl_ = _ensure_planar(ql)
    assert pl_.layout == "planar" and not pl_.scales_packed
    assert pl_.scales.shape == (32, 2)
    np.testing.assert_array_equal(
        np.asarray(pl_.scales), np.asarray(unpack_scale_pairs(ql.scales)))


def test_save_load_quantized_packed(rng, tmp_path):
    """safetensors save/load round-trips the packed int32 scales
    verbatim (QLinear.layout is inferred from the dtype)."""
    from quantizations_tpu.models.hf_loader import (
        load_quantized, save_quantized)
    from quantizations_tpu.models.llama import init_llama_params

    cfg = _tiny_cfg("bf16x2")
    params = init_llama_params(cfg, seed=0)
    path = str(tmp_path / "q.safetensors")
    save_quantized(params, path)
    back = load_quantized(path, cfg)
    assert back.layers.q.scales_packed
    np.testing.assert_array_equal(np.asarray(back.layers.q.scales),
                                  np.asarray(params.layers.q.scales))
    np.testing.assert_array_equal(np.asarray(back.layers.q.wp),
                                  np.asarray(params.layers.q.wp))


def test_orbax_cfg_json_bf16x2():
    from quantizations_tpu.models.checkpoint import (
        _cfg_from_json, _cfg_to_json)

    cfg = _tiny_cfg("bf16x2")
    back = _cfg_from_json(_cfg_to_json(cfg))
    assert back.quant.scales_dtype == "bf16x2"
    cfg32 = _tiny_cfg(jnp.float32)
    back32 = _cfg_from_json(_cfg_to_json(cfg32))
    assert jnp.dtype(back32.quant.scales_dtype) == jnp.dtype(jnp.float32)


def test_config_validation():
    from quantizations_tpu.config import QuantConfig

    QuantConfig(scales_dtype="bf16x2")          # accepted
    with pytest.raises(ValueError):
        QuantConfig(scales_dtype="bf16x3")


def test_bnb_export_packed(rng):
    """The bnb exporter widens packed scales back to per-row fp32
    absmax (the runtime's actual bf16-rounded values)."""
    from quantizations_tpu.models.hf_loader import _bnb_payload
    from quantizations_tpu.models.llama import quantize_linear

    W = jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))
    ql = quantize_linear(W, scales_dtype="bf16x2")
    ref = quantize_linear(W)
    packed, state = _bnb_payload(ql, "fp4", compress=False)
    packed_ref, _ = _bnb_payload(ref, "fp4", compress=False)
    np.testing.assert_array_equal(packed, packed_ref)
    np.testing.assert_array_equal(
        np.asarray(state.absmax).reshape(16, 2),
        np.asarray(unpack_scale_pairs(ql.scales)))
