"""Functional core: JAX quantize/dequantize vs the native golden oracle.

This is SURVEY.md §4 config 1: blockwise FP4 (and NF4) quantize→dequantize
round-trip of a 4096×4096-class weight vs a float reference, CPU-runnable.
The golden oracle is the C++ scalar implementation (csrc/golden.cpp) that
mirrors the reference CUDA device functions' exact decision thresholds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.quant import (
    QuantState,
    create_dynamic_map,
    dequantize_4bit,
    dequantize_blockwise,
    quantize_4bit,
    quantize_blockwise,
)
from quantizations_tpu.quant.functional import (
    dequantize_absmax,
    gemv_4bit,
    matmul_4bit,
    pack_4bit,
    unpack_4bit,
)
from quantizations_tpu.utils import golden


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_quantize_4bit_matches_golden(rng, quant_type):
    W = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
    packed, state = quantize_4bit(
        jnp.asarray(W), blocksize=64, quant_type=quant_type,
        compress_statistics=False,
    )
    g_packed, g_absmax = golden.quantize_4bit(W, 64, quant_type)
    np.testing.assert_array_equal(np.asarray(packed).reshape(-1), g_packed)
    np.testing.assert_array_equal(np.asarray(state.absmax), g_absmax)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_dequantize_4bit_matches_golden(rng, quant_type):
    W = rng.standard_normal((128, 256)).astype(np.float32)
    packed, state = quantize_4bit(
        jnp.asarray(W), blocksize=64, quant_type=quant_type,
        compress_statistics=False,
    )
    out = dequantize_4bit(packed, state, dtype=jnp.float32)
    g = golden.dequantize_4bit(
        np.asarray(packed), np.asarray(state.absmax), W.size, 64, quant_type
    ).reshape(W.shape)
    np.testing.assert_allclose(np.asarray(out), g, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_round_trip_error_bound(rng, quant_type):
    # Quantization is lossy but bounded: with per-64-block absmax scaling
    # the worst-case relative-to-blockmax error is half the largest code
    # gap (~1/6 for FP4, ~0.12 for NF4), plus a small contribution from
    # the 8-bit double quantization of the scales (default on).
    W = rng.standard_normal((256, 256)).astype(np.float32)
    packed, state = quantize_4bit(jnp.asarray(W), quant_type=quant_type)
    out = np.asarray(dequantize_4bit(packed, state, dtype=jnp.float32))
    blockmax = np.abs(W.reshape(-1, 64)).max(axis=1, keepdims=True)
    err = np.abs(out.reshape(-1, 64) - W.reshape(-1, 64)) / blockmax
    assert err.max() <= 0.18


def test_edge_values_and_zero_blocks():
    # all-zero block, ±absmax endpoints, tiny values near the 1/384 cut
    W = np.zeros((2, 64), dtype=np.float32)
    W[1, 0] = 1.0
    W[1, 1] = -1.0
    W[1, 2] = 1e-4  # below 1/384 of absmax -> code 0 -> dequant 0
    packed, state = quantize_4bit(
        jnp.asarray(W), compress_statistics=False, quant_type="fp4"
    )
    out = np.asarray(dequantize_4bit(packed, state, dtype=jnp.float32))
    assert np.all(out[0] == 0.0)
    assert out[1, 0] == 1.0 and out[1, 1] == -1.0
    assert out[1, 2] == 0.0
    g_packed, g_absmax = golden.quantize_4bit(W, 64, "fp4")
    np.testing.assert_array_equal(np.asarray(packed).reshape(-1), g_packed)


def test_nibble_order_high_is_even():
    # kernels.cu:463-471: byte = even_code << 4 | odd_code.
    codes = jnp.asarray(np.array([1, 2, 3, 4], dtype=np.uint8))
    packed = np.asarray(pack_4bit(codes))
    np.testing.assert_array_equal(packed, np.array([0x12, 0x34], np.uint8))
    np.testing.assert_array_equal(np.asarray(unpack_4bit(jnp.asarray(packed))),
                                  np.array([1, 2, 3, 4], np.uint8))


def test_quantize_blockwise_8bit_matches_golden(rng):
    A = (rng.standard_normal(4096) * 3).astype(np.float32)
    q, state = quantize_blockwise(jnp.asarray(A), blocksize=256)
    code = create_dynamic_map()
    gq, gabsmax = golden.quantize_blockwise_8bit(code, A, 256)
    np.testing.assert_array_equal(np.asarray(q).reshape(-1), gq)
    np.testing.assert_array_equal(np.asarray(state.absmax), gabsmax)
    out = dequantize_blockwise(q, state)
    gout = golden.dequantize_blockwise_8bit(code, gq, gabsmax, 256)
    np.testing.assert_allclose(np.asarray(out).reshape(-1), gout,
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_double_quantization_round_trip(rng, quant_type):
    # compress_statistics=True: absmax stored as 8-bit codes + offset +
    # nested state (reference core.py:563-576). The resolved scales must
    # be within dynamic-map quantization error of the raw absmax.
    W = rng.standard_normal((64, 512)).astype(np.float32) * 2.0
    packed, state = quantize_4bit(
        jnp.asarray(W), quant_type=quant_type, compress_statistics=True
    )
    assert state.nested
    assert state.absmax.dtype == jnp.uint8
    assert state.state2.blocksize == 256
    raw_absmax = golden.quantize_4bit(W, 64, quant_type)[1]
    resolved = np.asarray(dequantize_absmax(state))
    # 8-bit dynamic-map error on (absmax - offset), offset = mean
    centered = np.abs(raw_absmax - raw_absmax.mean()).max()
    assert np.abs(resolved - raw_absmax).max() <= 0.04 * centered + 1e-6
    # dequantize_4bit must use the resolved scales transparently
    out = np.asarray(dequantize_4bit(packed, state, dtype=jnp.float32))
    g = golden.dequantize_4bit(np.asarray(packed), resolved, W.size, 64,
                               quant_type).reshape(W.shape)
    np.testing.assert_allclose(out, g, rtol=1e-5, atol=1e-6)


def test_packed_shape_is_bnb_convention(rng):
    # reference core.py:545-546: packed output is ((n+1)//2, 1) uint8.
    W = rng.standard_normal((32, 64)).astype(np.float32)
    packed, _ = quantize_4bit(jnp.asarray(W))
    assert packed.shape == (W.size // 2, 1)
    assert packed.dtype == jnp.uint8


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_gemv_matches_golden(rng, quant_type):
    M, K = 128, 256
    W = rng.standard_normal((M, K)).astype(np.float32) * 0.1
    x = rng.standard_normal((1, K)).astype(np.float32)
    packed, state = quantize_4bit(
        jnp.asarray(W), quant_type=quant_type, compress_statistics=False
    )
    out = np.asarray(gemv_4bit(jnp.asarray(x), packed, state))
    g = golden.gemv_4bit(np.asarray(packed), np.asarray(state.absmax),
                         x, M, K, 64, quant_type)
    np.testing.assert_allclose(out.reshape(-1), g, rtol=2e-5, atol=2e-5)


def test_matmul_4bit_prefill_and_bias(rng):
    M, K, B = 96, 128, 4
    W = rng.standard_normal((M, K)).astype(np.float32) * 0.1
    x = rng.standard_normal((B, K)).astype(np.float32)
    bias = rng.standard_normal(M).astype(np.float32)
    packed, state = quantize_4bit(jnp.asarray(W), quant_type="nf4",
                                  compress_statistics=True,
                                  )
    out = np.asarray(matmul_4bit(jnp.asarray(x), packed, state,
                                 bias=jnp.asarray(bias)))
    W_dq = np.asarray(dequantize_4bit(packed, state, dtype=jnp.float32))
    expect = x @ W_dq.T + bias
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_quant_state_bnb_dict_round_trip(rng):
    W = rng.standard_normal((64, 128)).astype(np.float32)
    packed, state = quantize_4bit(jnp.asarray(W), quant_type="nf4")
    d = state.as_dict()
    for k in ("absmax", "quant_map", "nested_absmax", "nested_quant_map",
              "quant_state"):
        assert k in d
    state2 = QuantState.from_dict(d)
    out1 = np.asarray(dequantize_4bit(packed, state, dtype=jnp.float32))
    out2 = np.asarray(dequantize_4bit(packed, state2, dtype=jnp.float32))
    np.testing.assert_array_equal(out1, out2)
    assert state2.quant_type == "nf4"
    assert state2.shape == (64, 128)


def test_stochastic_blockwise_unbiased():
    """Stochastic 8-bit rounding: deterministic per key, unbiased in
    expectation, and exact for on-grid values."""
    import jax

    from quantizations_tpu.quant.functional import (
        dequantize_blockwise, quantize_blockwise)

    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.uniform(-1, 1, 512).astype(np.float32))
    key = jax.random.PRNGKey(0)
    q1, st1 = quantize_blockwise(A, blocksize=256, stochastic=True, key=key)
    q2, _ = quantize_blockwise(A, blocksize=256, stochastic=True, key=key)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))

    # unbiased: mean dequant over many keys approaches A much closer
    # than the one-shot rounding error
    acc = np.zeros(A.shape, np.float64)
    NKEYS = 64
    for i in range(NKEYS):
        q, st = quantize_blockwise(A, blocksize=256, stochastic=True,
                                   key=jax.random.PRNGKey(i))
        acc += np.asarray(dequantize_blockwise(q, st), dtype=np.float64)
    mean_err = np.abs(acc / NKEYS - np.asarray(A, np.float64)).mean()
    qd, std = quantize_blockwise(A, blocksize=256)
    det_err = np.abs(np.asarray(dequantize_blockwise(qd, std), np.float64)
                     - np.asarray(A, np.float64)).mean()
    assert mean_err < det_err * 0.5, (mean_err, det_err)

    # exact codebook values quantize losslessly under any key (each
    # 256-block is the full codebook x 0.5, so absmax normalization
    # recovers the grid exactly)
    _, st = quantize_blockwise(A, blocksize=256)
    grid = np.asarray(st.code) * 0.5
    G = jnp.asarray(np.tile(grid, 2).astype(np.float32))
    qg, stg = quantize_blockwise(G, blocksize=256, stochastic=True,
                                 key=jax.random.PRNGKey(7))
    back = np.asarray(dequantize_blockwise(qg, stg))
    np.testing.assert_allclose(back, np.asarray(G), rtol=0, atol=1e-6)
