"""Fused dequant + matmul Pallas kernel — prefill / large-batch path.

TPU-native realization of what the reference's dead WMMA kernels
attempted (reference kernels.cu:852-1059, never exported): a tensor-core
(MXU) matmul over 4-bit weights dequantized in-kernel. The XLA fallback
(nn/linear.apply_4bit else-branch) materializes the dequantized bf16
weight through HBM (~234 MB extra traffic per 8B layer per prefill);
this kernel decodes each weight tile in VMEM and feeds the MXU directly.

Scale handling differs from the GEMV kernel: with T token rows the MXU
work amortizes the decode, so scales are expanded per-word with the
128-lane-chunked gather (~30 op-equivalents per gathered element = ~4
extra VPU ops per weight — irrelevant next to T MXU rows) and folded
into the bf16 weight tile before the dot.

Grid: (T tiles, M tiles, K chunks) with the output block revisited and
accumulated across K (same pattern as ops/gemv.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv import _lut_setup, _pick_tiles, _plane_fn

__all__ = ["matmul_4bit_pallas"]


def _kernel(wp_ref, xp_ref, s_ref, tbl_ref, o_ref, *, lut, lut_fn,
            out_factor):
    wp = wp_ref[:]                      # [TM, kc] int32
    s = s_ref[:]                        # [TM, NB_total] fp32
    tm, kc = wp.shape
    nbc = kc // 8
    k_id = pl.program_id(2)

    # per-word scales for THIS chunk in ONE one-hot matmul:
    # Rfull[b, c] = 1 iff full-row block b covers chunk word c. A single
    # bf16 MXU pass: the one-hot is exact in bf16 and the scale rounding
    # (<=2^-9 rel) is the same class as the bf16 weight rounding this
    # MXU path already carries. (A gather-based expansion SIGABRTs the
    # Mosaic compiler; HIGHEST-precision expansion costs 3 passes and
    # ~25% of kernel time.)
    nb_total = s.shape[1]
    blk = jax.lax.broadcasted_iota(jnp.int32, (nb_total, kc), 0)
    word = jax.lax.broadcasted_iota(jnp.int32, (nb_total, kc), 1)
    Rfull = (word // 8 + k_id * nbc == blk).astype(jnp.bfloat16)
    sf = s.astype(jnp.bfloat16)
    if out_factor != 1.0:
        sf = sf * jnp.bfloat16(out_factor)
    srep = jnp.dot(sf, Rfull,
                   preferred_element_type=jnp.float32)   # [TM, kc]

    plane = _plane_fn(tm, tbl_ref, lut, lut_fn)
    # one MXU dot per nibble plane — avoids any in-kernel reshape/concat
    tt = xp_ref.shape[0]
    part = jnp.zeros((tt, tm), jnp.float32)
    for j in range(8):
        Wj = (plane(wp, j) * srep
              ).astype(jnp.bfloat16)                 # [TM, kc]
        xj = xp_ref[:, j, :].astype(jnp.bfloat16)    # [TT, kc]
        part = part + jax.lax.dot_general(
            xj, Wj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [TT, TM]

    @pl.when(k_id == 0)
    def _():
        o_ref[:] = part

    @pl.when(k_id != 0)
    def _():
        o_ref[:] = o_ref[:] + part


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "lut", "tile_m", "tile_t", "interpret"),
)
def matmul_4bit_pallas(
    wp: jnp.ndarray,       # [M, K/8] int32
    scales: jnp.ndarray,   # [M, K/64] float
    x: jnp.ndarray,        # [T, K] activations
    quant_type: str = "fp4",
    lut: Optional[str] = None,
    tile_m: Optional[int] = None,
    tile_t: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x @ dequant(W).T -> [T, M]`` fp32, weights decoded in VMEM.
    bf16 MXU operands (dequantized values and bf16 activations are
    exactly representable; products accumulate in fp32)."""
    M, K8 = wp.shape
    K = K8 * 8
    T = x.shape[0]
    assert x.shape[1] == K
    while T % tile_t:
        tile_t //= 2
    tile_m, kc = _pick_tiles(M, K8, 2, tile_m)
    lut_s, lut_fn, tbl, out_factor = _lut_setup(quant_type, lut, K8)

    # plane-major activation: xp[t, j, c] = x[t, 8c + j]
    xp = x.reshape(T, K8, 8).swapaxes(1, 2)

    kernel = functools.partial(
        _kernel, lut=lut_s, lut_fn=lut_fn, out_factor=out_factor)
    out = pl.pallas_call(
        kernel,
        grid=(T // tile_t, M // tile_m, K8 // kc),
        in_specs=[
            pl.BlockSpec((tile_m, kc), lambda t, i, kq: (i, kq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 8, kc), lambda t, i, kq: (t, 0, kq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, K8 // 8), lambda t, i, kq: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tbl.shape[1], 256),
                         lambda t, i, kq: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_m),
                               lambda t, i, kq: (t, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * M * K,
            bytes_accessed=M * K8 * 4 + T * K * 4 + T * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wp, xp, scales, tbl)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "lut", "tile_m", "tile_t", "interpret"),
)
def matmul_4bit_pallas_stacked(
    wp: jnp.ndarray,         # [L, M, K/8] int32 stacked
    scales: jnp.ndarray,     # [L, M, K/64] float
    x: jnp.ndarray,          # [T, K]
    layer_idx: jnp.ndarray,  # scalar int32
    quant_type: str = "fp4",
    lut: Optional[str] = None,
    tile_m: Optional[int] = None,
    tile_t: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Layer-indexed fused dequant+matmul over stacked weights: the
    scalar-prefetch index map reads layer ``i`` directly from the
    stacked HBM buffer (no per-step weight copy inside a lax.scan —
    same mechanism as ops/gemv.gemv_4bit_pallas_stacked)."""
    L, M, K8 = wp.shape
    K = K8 * 8
    T = x.shape[0]
    assert x.shape[1] == K
    while T % tile_t:
        tile_t //= 2
    _, kc = _pick_tiles(M, K8, 2, None)
    if tile_m is None:
        tile_m = 512
        while tile_m > 128 and (M % tile_m or tile_m * kc * 28 > 8 * 2**20):
            tile_m //= 2
    while M % tile_m:
        tile_m //= 2
    lut_s, lut_fn, tbl, out_factor = _lut_setup(quant_type, lut, K8)
    xp = x.reshape(T, K8, 8).swapaxes(1, 2)

    def k_wrap(idx_ref, wp_ref, xp_ref, s_ref, tbl_ref, o_ref):
        _kernel(wp_ref[0], xp_ref, s_ref[0], tbl_ref, o_ref,
                lut=lut_s, lut_fn=lut_fn, out_factor=out_factor)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // tile_t, M // tile_m, K8 // kc),
        in_specs=[
            pl.BlockSpec((1, tile_m, kc),
                         lambda t, i, kq, idx: (idx[0], i, kq)),
            pl.BlockSpec((tile_t, 8, kc),
                         lambda t, i, kq, idx: (t, 0, kq)),
            pl.BlockSpec((1, tile_m, K8 // 8),
                         lambda t, i, kq, idx: (idx[0], i, 0)),
            pl.BlockSpec((1, tbl.shape[1], 256),
                         lambda t, i, kq, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_m),
                               lambda t, i, kq, idx: (t, i)),
    )
    out = pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * M * K,
            bytes_accessed=M * K8 * 4 + T * K * 4 + T * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), wp, xp, scales, tbl)
    return out
