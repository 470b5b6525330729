"""Decode-once prefill pair kernel (round 5): interpret-mode numerics
vs the decode-band pair kernel, packed-scale bit-identity, stacked
variant, and the chunked wrapper.

Perf status: raced on chip and LOST to the dense dequant+MXU prefill
path (chain_r5j: T=512 280.7 ms vs 142-156 — Mosaic starves the MXU at
prefill live-set sizes), so dispatch stays env-gated off
(QT_PREFILL_PAIR). These tests keep the raced artifact correct.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.ops.qmatmul import (
    matmul_4bit_pair_pallas,
    matmul_4bit_pair_prefill_pallas,
    matmul_4bit_pair_prefill_pallas_stacked,
    pack_scale_pairs,
    pair_prefill_matmul,
    planar_to_pair,
    prefill_pair_ok,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, M, K, L=None):
    if L is None:
        by = jnp.asarray(
            rng.integers(0, 256, (M, K // 2), np.int64).astype(np.int32))
        wp2 = planar_to_pair(pack_i32_rows(by, M, K))
        scales = jnp.asarray(rng.random((M, K // 64), np.float32))
        return wp2, scales
    ws, ss = zip(*[_mk(rng, M, K) for _ in range(L)])
    return jnp.stack(ws), jnp.stack(ss)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_prefill_pair_matches_decode_kernel(rng, quant_type):
    M, K, T = 256, 512, 64
    wp2, scales = _mk(rng, M, K)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    ref = np.asarray(matmul_4bit_pair_pallas(
        wp2, scales, x, quant_type=quant_type, interpret=True))
    out = np.asarray(matmul_4bit_pair_prefill_pallas(
        wp2, scales, x, quant_type=quant_type, interpret=True))
    # same numerics class; partial-sum split may differ (kc4 tiling)
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_prefill_pair_packed_scales_bit_identical(rng, quant_type):
    M, K, T = 128, 512, 32
    wp2, scales = _mk(rng, M, K)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    a = np.asarray(matmul_4bit_pair_prefill_pallas(
        wp2, scales, x, quant_type=quant_type, interpret=True))
    b = np.asarray(matmul_4bit_pair_prefill_pallas(
        wp2, pack_scale_pairs(scales), x, quant_type=quant_type,
        interpret=True))
    np.testing.assert_array_equal(a, b)


def test_prefill_pair_stacked(rng):
    M, K, T, L = 128, 256, 32, 2
    wps, ss = _mk(rng, M, K, L)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    for l in range(L):
        s = np.asarray(matmul_4bit_pair_prefill_pallas_stacked(
            wps, ss, x, jnp.int32(l), quant_type="fp4", interpret=True))
        r = np.asarray(matmul_4bit_pair_prefill_pallas(
            wps[l], ss[l], x, quant_type="fp4", interpret=True))
        np.testing.assert_array_equal(s, r)


def test_pair_prefill_matmul_chunks(rng):
    """T above the residency cap chunks through the kernel; equality
    with per-chunk calls is exact (identical tilings per chunk)."""
    from quantizations_tpu.ops import qmatmul as qm

    M, K = 128, 256
    wp2, scales = _mk(rng, M, K)
    old = qm.PREFILL_PAIR_CHUNK_T
    qm.PREFILL_PAIR_CHUNK_T = 32
    try:
        x = jnp.asarray(rng.standard_normal((80, K)).astype(np.float32))
        out = np.asarray(pair_prefill_matmul(wp2, scales, x, "fp4",
                                             interpret=True))
        parts = [np.asarray(matmul_4bit_pair_prefill_pallas(
            wp2, scales, x[t0:t0 + 32], quant_type="fp4",
            interpret=True)) for t0 in (0, 32, 64)]
        np.testing.assert_array_equal(out, np.concatenate(parts, 0))
    finally:
        qm.PREFILL_PAIR_CHUNK_T = old


def test_prefill_pair_ok_shapes():
    assert prefill_pair_ok(14336, 1024, 512)
    assert prefill_pair_ok(4096, 3584, 512)
    assert not prefill_pair_ok(14336, 1024, 500)   # T % 8 != 0
