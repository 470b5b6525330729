"""Linear4bit module layer: config 3 of SURVEY.md §4 — NF4 + double-quant
with bnb-compatible quant_state/interface, plus forward-path equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.nn import (
    Linear4bit,
    Params4bit,
    dequantize_permuted,
    permute_cols,
)
from quantizations_tpu.quant import dequantize_4bit
from quantizations_tpu.utils import golden


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_dequantize_permuted_matches_element_order(rng, quant_type):
    M, K = 128, 256
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    p = Params4bit.quantize(jnp.asarray(W), quant_type=quant_type,
                            compress_statistics=False)
    Wp = np.asarray(dequantize_permuted(p.wp, p.scales, quant_type,
                                        dtype=jnp.float32))
    Wd = np.asarray(dequantize_4bit(p.packed_u8(), p.quant_state,
                                    dtype=jnp.float32))
    # invert the column permutation: permuted col j*K/8+c == element 8c+j
    K8 = K // 8
    inv = np.empty(K, dtype=np.int64)
    for j in range(8):
        for c in range(K8):
            inv[8 * c + j] = j * K8 + c
    np.testing.assert_array_equal(Wp[:, inv], Wd)


def test_permute_cols_matches_weight_permutation(rng):
    K = 64
    x = rng.standard_normal((3, K)).astype(np.float32)
    xp = np.asarray(permute_cols(jnp.asarray(x)))
    K8 = K // 8
    for j in range(8):
        for c in range(K8):
            np.testing.assert_array_equal(xp[:, j * K8 + c], x[:, 8 * c + j])


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
@pytest.mark.parametrize("tokens", [1, 16])
def test_linear4bit_forward_matches_golden(rng, quant_type, tokens):
    M, K = 128, 256
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    x = rng.standard_normal((tokens, K)).astype(np.float32)
    layer = Linear4bit.create(
        jnp.asarray(W), quant_type=quant_type, compute_dtype=jnp.float32,
        compress_statistics=False,
    )
    out = np.asarray(layer(jnp.asarray(x)))
    packed, absmax = golden.quantize_4bit(W, 64, quant_type)
    ref = np.stack([
        golden.gemv_4bit(packed, absmax, x[i], M, K, 64, quant_type)
        for i in range(tokens)
    ])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_linear4bit_bias_and_dtype_latching(rng):
    M, K = 64, 128
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(M).astype(np.float32)
    x = rng.standard_normal((2, 5, K)).astype(np.float32)
    layer = Linear4bit.create(jnp.asarray(W), bias=jnp.asarray(bias),
                              compute_dtype=jnp.float32)
    out = layer(jnp.asarray(x, dtype=jnp.bfloat16))
    # output cast back to input dtype (reference modules.py:149)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (2, 5, M)


def test_linear4bit_jit_and_vmap(rng):
    M, K = 64, 128
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    layer = Linear4bit.create(jnp.asarray(W), compute_dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32))
    eager = layer(x)
    jitted = jax.jit(lambda l, x: l(x))(layer, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-5, atol=1e-5)


def test_params4bit_shape_validation():
    with pytest.raises(ValueError):
        Params4bit.quantize(jnp.ones((16, 63)))


def test_linear4bit_nf4_double_quant_bnb_state(rng):
    # config 3: NF4 + compress_statistics with bnb-compatible quant_state
    M, K = 64, 128
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    layer = Linear4bit.create(jnp.asarray(W), quant_type="nf4",
                              compress_statistics=True)
    qs = layer.quant_state
    assert qs.nested and qs.quant_type == "nf4"
    d = qs.as_dict()
    assert set(d) >= {"absmax", "quant_map", "nested_absmax",
                      "nested_quant_map", "quant_state"}
    meta = d["quant_state"]
    assert meta["blocksize"] == 64
    assert meta["nested_blocksize"] == 256
    assert meta["shape"] == (M, K)
    # packed bytes view round-trips through the int32 word layout
    u8 = np.asarray(layer.weight.packed_u8())
    assert u8.shape == (M * K // 2, 1)


def test_linear4bit_fp16_compute_dtype(rng):
    """The reference's hard dtype contract is fp16 activations in, fp32
    GEMV accumulation (pythonInterface.cpp:15,82).  fp16 compute_dtype
    must flow through every dispatch band (fused decode, dense) with
    accuracy comparable to the bf16/fp32 paths."""
    M, K = 128, 256
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    ref_layer = Linear4bit.create(jnp.asarray(W),
                                  compute_dtype=jnp.float32)
    f16_layer = Linear4bit.create(jnp.asarray(W),
                                  compute_dtype=jnp.float16)
    assert f16_layer.compute_dtype == jnp.float16
    for tokens in (1, 16, 128):  # GEMV / qmatmul / dense bands
        x = rng.standard_normal((tokens, K)).astype(np.float16)
        out = np.asarray(f16_layer(jnp.asarray(x)))
        assert out.dtype == np.float16  # cast back to input dtype
        ref = np.asarray(ref_layer(jnp.asarray(x, dtype=jnp.float32)))
        # fp16 mantissa (10 bits) keeps the product within ~1e-2 of the
        # fp32 path at these magnitudes
        np.testing.assert_allclose(out.astype(np.float32), ref,
                                   rtol=2e-2, atol=2e-2)
