"""Pallas blockwise quantize/dequantize kernels vs the functional
(bit-exact bnb semantics) path — SURVEY.md §4 config 1 at kernel level."""

import jax.numpy as jnp
import numpy as np
import pytest

import quantizations_tpu.quant as q
from quantizations_tpu.ops import pack_i32_rows
from quantizations_tpu.ops.quantize import (
    dequantize_4bit_pallas,
    quantize_4bit_pallas,
)
from quantizations_tpu.quant.functional import dequantize_absmax


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
@pytest.mark.parametrize("blocksize", [64, 128])
def test_quantize_kernel_matches_functional(rng, quant_type, blocksize):
    M, K = 256, 512
    W = (rng.standard_normal((M, K)) * 0.2).astype(np.float32)
    wp, absmax = quantize_4bit_pallas(
        jnp.asarray(W), blocksize=blocksize, quant_type=quant_type,
        tile_m=128, interpret=True)

    packed_ref, state = q.quantize_4bit(
        jnp.asarray(W), blocksize=blocksize, quant_type=quant_type,
        compress_statistics=False)
    wp_ref = pack_i32_rows(packed_ref, M, K)
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(wp_ref))
    np.testing.assert_array_equal(
        np.asarray(absmax).reshape(-1), np.asarray(state.absmax))


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_dequantize_kernel_matches_functional(rng, quant_type):
    M, K = 128, 512
    W = (rng.standard_normal((M, K)) * 0.2).astype(np.float32)
    packed, state = q.quantize_4bit(
        jnp.asarray(W), quant_type=quant_type, compress_statistics=True)
    wp = pack_i32_rows(packed, M, K)
    scales = dequantize_absmax(state).reshape(M, K // 64)

    out = dequantize_4bit_pallas(
        wp, scales, quant_type=quant_type, dtype=jnp.float32,
        tile_m=128, interpret=True)
    ref = q.dequantize_4bit(packed, state, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_quantize_dequantize_roundtrip_error_bounded(rng):
    M, K = 128, 256
    W = (rng.standard_normal((M, K))).astype(np.float32)
    wp, absmax = quantize_4bit_pallas(
        jnp.asarray(W), quant_type="nf4", tile_m=128, interpret=True)
    out = dequantize_4bit_pallas(
        wp, absmax, quant_type="nf4", tile_m=128, interpret=True)
    err = np.abs(np.asarray(out) - W)
    # NF4 error within a block is bounded by the largest codebook
    # half-gap (|-1 - -0.696|/2 ~= 0.152) times the block absmax
    block_max = np.abs(W.reshape(M, K // 64, 64)).max(-1, keepdims=True)
    assert (err.reshape(M, K // 64, 64) <= 0.152 * block_max + 1e-6).all()