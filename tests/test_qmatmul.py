"""Fused dequant+matmul (prefill) kernel vs the XLA dequant-then-matmul
reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantizations_tpu.quant as q
from quantizations_tpu.nn.linear import dequantize_permuted, permute_cols
from quantizations_tpu.ops import pack_i32_rows
from quantizations_tpu.ops.qmatmul import matmul_4bit_pallas


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
@pytest.mark.parametrize("T", [8, 64])
def test_matmul_kernel_vs_xla(rng, quant_type, T):
    M, K = 256, 512
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    x = (rng.standard_normal((T, K)) * 0.5).astype(np.float32)
    packed, state = q.quantize_4bit(jnp.asarray(W), quant_type=quant_type,
                                    compress_statistics=False)
    wp = pack_i32_rows(packed, M, K)
    scales = state.absmax.reshape(M, K // 64)

    out = np.asarray(matmul_4bit_pallas(
        wp, scales, jnp.asarray(x), quant_type=quant_type,
        tile_m=128, tile_t=8, interpret=True))

    Wd = np.asarray(dequantize_permuted(wp, scales, quant_type,
                                        dtype=jnp.float32))
    xp = np.asarray(permute_cols(jnp.asarray(x)))
    ref = xp @ Wd.T
    # kernel uses bf16 MXU operands (values exactly representable;
    # activations rounded to bf16)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_matmul_kernel_double_quant_scales(rng):
    from quantizations_tpu.nn import Params4bit

    M, K, T = 128, 256, 16
    W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
    p = Params4bit.quantize(jnp.asarray(W), quant_type="fp4",
                            compress_statistics=True)
    x = rng.standard_normal((T, K)).astype(np.float32)
    out = np.asarray(matmul_4bit_pallas(
        p.wp, p.scales, jnp.asarray(x), quant_type="fp4",
        tile_m=128, tile_t=8, interpret=True))
    Wd = np.asarray(dequantize_permuted(p.wp, p.scales, "fp4",
                                        dtype=jnp.float32))
    ref = np.asarray(permute_cols(jnp.asarray(x))) @ Wd.T
    # kernel rounds both weights AND scales to bf16 (MXU path)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=4e-2)
