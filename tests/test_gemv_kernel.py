"""Fused dequant+GEMV Pallas kernel — SURVEY.md §4 config 2.

Runs in interpret mode on CPU; compares against the C++ golden GEMV and
the XLA dequant-then-matmul reference at Llama-decode-like shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import quantizations_tpu.quant as q
from quantizations_tpu.ops import gemv_4bit_pallas, pack_i32_rows
from quantizations_tpu.ops.lut import lut_fp4_bits, lut_take, lut_tree
from quantizations_tpu.quant.codebooks import FP4_CODE, NF4_CODE
from quantizations_tpu.utils import golden


def test_lut_strategies_bit_exact():
    codes = jnp.arange(16, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(lut_tree(codes, FP4_CODE)),
                                  FP4_CODE)
    np.testing.assert_array_equal(np.asarray(lut_tree(codes, NF4_CODE)),
                                  NF4_CODE)
    np.testing.assert_array_equal(np.asarray(lut_fp4_bits(codes)), FP4_CODE)
    np.testing.assert_array_equal(np.asarray(lut_take(codes, NF4_CODE)),
                                  NF4_CODE)


@pytest.mark.parametrize("quant_type,lut", [
    ("fp4", "fp4_bits"), ("fp4", "tree"), ("nf4", "tree"),
    ("fp4", "take16"), ("nf4", "take16"),
    ])
def test_gemv_kernel_vs_golden(rng, quant_type, lut):
    M, K = 256, 512
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    x = rng.standard_normal((1, K)).astype(np.float32)
    packed, state = q.quantize_4bit(jnp.asarray(W), quant_type=quant_type,
                                    compress_statistics=False)
    wp = pack_i32_rows(packed, M, K)
    scales = state.absmax.reshape(M, K // 64)
    out = np.asarray(gemv_4bit_pallas(
        wp, scales, jnp.asarray(x), quant_type=quant_type, lut=lut,
        tile_m=128, interpret=True,
    ))
    ref = golden.gemv_4bit(np.asarray(packed), np.asarray(state.absmax),
                           x, M, K, 64, quant_type)
    # the kernel is fp32 throughout: bit-faithful to dequant-then-dot
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=2e-5, atol=2e-5)


def test_gemv_stacked_matches_flat(rng):
    from quantizations_tpu.ops import gemv_4bit_pallas_stacked

    L, M, K = 3, 128, 256
    wps, sces, outs = [], [], []
    x = rng.standard_normal((1, K)).astype(np.float32)
    for i in range(L):
        W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
        packed, state = q.quantize_4bit(jnp.asarray(W), quant_type="fp4",
                                        compress_statistics=False)
        wp = pack_i32_rows(packed, M, K)
        sc = state.absmax.reshape(M, K // 64)
        wps.append(wp)
        sces.append(sc)
        outs.append(np.asarray(gemv_4bit_pallas(
            wp, sc, jnp.asarray(x), quant_type="fp4", tile_m=128,
            interpret=True)))
    wp_all = jnp.stack(wps)
    sc_all = jnp.stack(sces)
    for i in range(L):
        got = np.asarray(gemv_4bit_pallas_stacked(
            wp_all, sc_all, jnp.asarray(x), jnp.int32(i),
            quant_type="fp4", tile_m=128, interpret=True))
        # same kernel, but the interpreter constant-folds the static
        # (flat) call differently -> last-ulp fp32 deltas
        np.testing.assert_allclose(got, outs[i], rtol=1e-5, atol=1e-6)


def test_gemv_kernel_small_batch(rng):
    M, K, B = 128, 256, 4
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    x = rng.standard_normal((B, K)).astype(np.float32)
    packed, state = q.quantize_4bit(jnp.asarray(W), quant_type="fp4",
                                    compress_statistics=False)
    wp = pack_i32_rows(packed, M, K)
    scales = state.absmax.reshape(M, K // 64)
    out = np.asarray(gemv_4bit_pallas(
        wp, scales, jnp.asarray(x), quant_type="fp4", tile_m=128,
        interpret=True,
    ))
    for b in range(B):
        ref = golden.gemv_4bit(np.asarray(packed), np.asarray(state.absmax),
                               x[b], M, K, 64, "fp4")
        np.testing.assert_allclose(out[b], ref, rtol=2e-5, atol=2e-5)


def test_gemv_kernel_with_double_quant_scales(rng):
    # Scales resolved from a nested (double-quantized) state must flow
    # through the kernel identically to plain fp32 absmax.
    from quantizations_tpu.nn import Params4bit

    M, K = 128, 256
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    p = Params4bit.quantize(jnp.asarray(W), quant_type="nf4",
                            compress_statistics=True)
    x = rng.standard_normal((1, K)).astype(np.float32)
    out = np.asarray(gemv_4bit_pallas(
        p.wp, p.scales, jnp.asarray(x), quant_type="nf4", tile_m=128,
        interpret=True,
    ))
    resolved = np.asarray(p.scales).reshape(-1)
    ref = golden.gemv_4bit(np.asarray(p.packed_u8()), resolved, x, M, K,
                           64, "nf4")
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=2e-5, atol=2e-5)
