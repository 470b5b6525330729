"""Fused dequant + GEMV Pallas kernel — the flagship decode kernel.

TPU-native replacement for the reference's production decode kernel
``kgemm_4bit_inference_naive`` (reference kernels.cu:1062-1219). Design
differences, per SURVEY.md §7:

- Packed int4 weights are read once from HBM as int32 words (8 codes per
  word, bnb byte order), streamed through VMEM by the Pallas pipeline —
  sequential, lane-aligned access (the reference kernel lost 45% of its
  sectors to uncoalesced loads and ran at 24.8% occupancy).
- Scales arrive pre-resolved as fp32 (the double-quant decode is hoisted
  to load time, fixing the per-call nested dequant at reference
  core.py:467).
- Codebook decode is vectorized VPU arithmetic (see ops/lut.py), not a
  per-element table walk.
- fp32 accumulation throughout (matching kernels.cu:1201-1211).

Layout algebra: word ``c`` of row ``m`` holds elements ``k = 8c .. 8c+7``.
A nibble-plane unpack yields 8 arrays ``codes_j[m, c] = code(k=8c+j)``,
so the dot is computed per-plane against a permuted activation
``xp[j, c] = x[8c + j]`` and the 64-element quant block of ``(j, c)`` is
``c // 8`` independent of ``j`` — one scale column pattern shared by all
planes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.codebooks import get_4bit_code
from .lut import make_lut

__all__ = ["gemv_4bit_pallas", "pack_i32_rows", "permute_activation"]

# Nibble position of element j within an int32 word under bnb byte order
# (byte = even<<4 | odd, bytes little-endian): element j lives at bit
# offset 8*(j//2) + (4 if j even else 0).
_SHIFTS = tuple(8 * (j // 2) + (4 - 4 * (j % 2)) for j in range(8))


def pack_i32_rows(packed_u8: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    """bnb flat packed bytes ``[rows*cols/2(,1)]`` -> int32 words
    ``[rows, cols/8]``, little-endian (same memory contents as a bitcast).

    Built from stride-4 lane slices rather than a ``[..., 4]`` minor-axis
    bitcast: TPU tiled layouts pad a size-4 minor dim to 128 lanes (32x
    memory — an 8B lm_head would transiently allocate 33 GB)."""
    b = packed_u8.reshape(rows, cols // 2)
    b0 = b[:, 0::4].astype(jnp.int32)
    b1 = b[:, 1::4].astype(jnp.int32)
    b2 = b[:, 2::4].astype(jnp.int32)
    b3 = b[:, 3::4].astype(jnp.int32)
    return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


def permute_activation(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, K] -> [B, 8, K/8]`` with ``xp[b, j, c] = x[b, 8c + j]``."""
    B, K = x.shape
    return x.reshape(B, K // 8, 8).swapaxes(-1, -2)


def _gemv_kernel(wp_ref, xp_ref, s_ref, o_ref, *, lut, batch, group_mm):
    wp = wp_ref[:]  # [TM, K8] int32
    k8 = wp.shape[1]
    tm = wp.shape[0]
    accs = [jnp.zeros(wp.shape, jnp.float32) for _ in range(batch)]
    for j in range(8):
        codes = (wp >> _SHIFTS[j]) & 15
        vals = lut(codes)  # [TM, K8] fp32
        for b in range(batch):
            accs[b] = accs[b] + vals * xp_ref[b, j, :][None, :]
    s = s_ref[:]  # [TM, K/64] fp32
    if group_mm:
        # Group-8 lane reduction via a tiny 0/1 MXU matmul:
        # g[m, blk] = sum_{c in 8blk..8blk+7} acc[m, c].
        lane = jax.lax.broadcasted_iota(jnp.int32, (k8, k8 // 8), 0)
        blk = jax.lax.broadcasted_iota(jnp.int32, (k8, k8 // 8), 1)
        E = (lane // 8 == blk).astype(jnp.float32)  # [K8, K/64]
        for b in range(batch):
            # HIGHEST precision: fp32 operands decompose exactly into
            # 3 bf16 passes, keeping the reduction bit-faithful on MXU.
            g = jnp.dot(accs[b], E, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            o_ref[b, :] = jnp.sum(g * s, axis=1)
    else:
        # repeat-interleave: srep[m, c] = s[m, c // 8]
        srep = jnp.repeat(s, 8, axis=1)  # [TM, K8]
        for b in range(batch):
            o_ref[b, :] = jnp.sum(accs[b] * srep, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "lut", "tile_m", "group_mm", "interpret"),
)
def gemv_4bit_pallas(
    wp: jnp.ndarray,       # [M, K/8] int32 packed weights
    scales: jnp.ndarray,   # [M, K/64] fp32 resolved absmax
    x: jnp.ndarray,        # [B, K] activations (any float dtype)
    quant_type: str = "fp4",
    lut: Optional[str] = None,
    tile_m: int = 512,
    group_mm: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused 4-bit dequant + GEMV: returns ``x @ dequant(W).T`` as
    ``[B, M]`` float32. ``B`` must be small (decode batch); prefill goes
    through the dequant+MXU-matmul path instead (ops/matmul.py)."""
    M, K8 = wp.shape
    K = K8 * 8
    B = x.shape[0]
    assert x.shape[1] == K, (x.shape, K)
    assert scales.shape == (M, K8 // 8), (scales.shape, (M, K8 // 8))
    while M % tile_m:
        tile_m //= 2
    if lut is None:
        lut = "fp4_bits" if quant_type == "fp4" else "tree"
    lut_fn = make_lut(lut, get_4bit_code(quant_type))
    xp = permute_activation(x.astype(jnp.float32))

    kernel = functools.partial(
        _gemv_kernel, lut=lut_fn, batch=B, group_mm=group_mm
    )
    grid = (M // tile_m,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, K8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, K8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, K8 // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * K,
            bytes_accessed=M * K8 * 4 + M * (K8 // 8) * 4 + B * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wp, xp, scales)
    return out
