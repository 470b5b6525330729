"""Pallas blockwise 4-bit quantize / dequantize kernels.

TPU-native equivalents of the reference's ``kQuantizeBlockwise`` /
``kDequantizeBlockwise`` CUDA kernels (reference kernels.cu:340-478,
480-568) for the weight path:

- quantize: per-64-element absmax (strided-lane max tree — lanes have no
  segment-reduce primitive), branchless FP4/NF4 code ladder, nibble pack
  into int32 words (8 codes/word, bnb byte order).
- dequantize: codebook decode (ops/lut.py strategies) + exact scale
  expansion via a one-hot MXU matmul.

The absmax double-quantization (8-bit statistics against the dynamic
map, reference core.py:563-576) stays on the XLA functional path — it
touches 1/64th of the elements and needs a 256-entry binary search that
has no efficient Mosaic lowering (gathers are single-vreg row-local).

These kernels serve checkpoint load (quantize once per tensor) and the
standalone public API; the decode hot loop uses ops/gemv.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.codebooks import NF4_CODE, code_midpoints
from .gemv import _SHIFTS
from .lut import lut_fp4_bits, lut_tree

__all__ = ["quantize_4bit_pallas", "dequantize_4bit_pallas"]

_NF4_MIDS = tuple(float(v) for v in code_midpoints(NF4_CODE))


def _fp4_codes(x):
    """Branchless dQuantizeFP4 ladder (reference kernels.cu:113-163),
    literal fp32 thresholds; int32 codes."""
    sign = jnp.where(x < 0, 8, 0)
    a = jnp.abs(x)
    c = jnp.where(
        a > 0.29166667,
        jnp.where(
            a > 0.583333,
            jnp.where(a > 0.8333333, 3, 2),
            jnp.where(a > 0.4166667, 5, 4),
        ),
        jnp.where(
            a > 0.0859375,
            jnp.where(a > 0.20833333, 7, 6),
            jnp.where(a > 0.00260417, 1, 0),
        ),
    )
    return c + sign


def _nf4_codes(x):
    """Nearest-entry against the sorted NF4 table: code = #(x > midpoint)
    (ties to the lower code, matching dQuantize's strict compare)."""
    c = jnp.zeros(x.shape, jnp.int32)
    for m in _NF4_MIDS:
        c = c + (x > jnp.float32(m)).astype(jnp.int32)
    return c


def _expand_blocks(s, k, blocksize):
    """Exact ``[TM, K/bs] -> [TM, K]`` block expansion via a one-hot MXU
    matmul (copying through a 0/1 matrix at HIGHEST precision is exact)."""
    tm, nb = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    R = (col // blocksize == row).astype(jnp.float32)
    return jnp.dot(s, R, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _select_stride(a, stride):
    """Exact ``a[:, 0::stride]`` via a one-hot MXU matmul — Mosaic has no
    strided-lane slicing (it lowers to a gather it rejects)."""
    tm, k = a.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k // stride), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k // stride), 1)
    S = (row == col * stride).astype(jnp.float32)
    return jnp.dot(a, S, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _quantize_kernel(wperm_ref, wp_ref, s_ref, *, blocksize, quant_type):
    """Input arrives plane-major (``wperm[m, j, c]`` = element ``8c+j``,
    permuted outside the kernel) so every lane op is stride-free:
    Mosaic supports neither strided lane slices nor wide gathers."""
    wperm = wperm_ref[:]                        # [TM, 8, K8]
    tm, _, k8 = wperm.shape
    planes = [wperm[:, j, :].astype(jnp.float32) for j in range(8)]

    # per-word absmax (8 elements each), then a windowed max over the
    # blocksize/8 words of each block via a roll tree
    wmax = jnp.abs(planes[0])
    for j in range(1, 8):
        wmax = jnp.maximum(wmax, jnp.abs(planes[j]))
    words_per_block = blocksize // 8
    step = 1
    while step < words_per_block:
        # left-rotate by `step` == right-rotate by k8-step (pltpu.roll
        # only accepts non-negative shifts)
        wmax = jnp.maximum(wmax, pltpu.roll(wmax, k8 - step, axis=1))
        step *= 2
    # lane 8b*wpb.. holds block b's max; select block starts exactly
    absmax = _select_stride(wmax, words_per_block)   # [TM, K8/wpb]
    s_ref[:] = absmax

    inv = jnp.where(absmax > 0, 1.0 / absmax, 0.0)
    inv_rep = _expand_blocks(inv, k8, words_per_block)  # [TM, K8]
    word = jnp.zeros((tm, k8), jnp.int32)
    for j in range(8):
        norm = planes[j] * inv_rep
        codes = (_fp4_codes(norm) if quant_type == "fp4"
                 else _nf4_codes(norm))
        word = word | (codes << _SHIFTS[j])
    wp_ref[:] = word


def _dequantize_kernel(wp_ref, s_ref, o_ref, *, quant_type, out_dtype):
    wp = wp_ref[:]
    tm, k8 = wp.shape
    srep = _expand_blocks(s_ref[:], k8, 8)     # per-word scales [TM, K8]
    lut = (lut_fp4_bits if quant_type == "fp4"
           else functools.partial(lut_tree, table=tuple(NF4_CODE)))
    for j in range(8):
        vals = lut((wp >> _SHIFTS[j]) & 15) * srep
        o_ref[:, j, :] = vals.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("blocksize", "quant_type", "tile_m",
                              "interpret"))
def quantize_4bit_pallas(
    W: jnp.ndarray,            # [M, K] float
    blocksize: int = 64,
    quant_type: str = "fp4",
    tile_m: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blockwise 4-bit quantization on device.

    Returns ``(wp [M, K/8] int32 packed words, absmax [M, K/blocksize]
    fp32)`` — the runtime layout (same memory contents as bnb's packed
    bytes; see ops/gemv.pack_i32_rows). Matches the functional
    ``quant.quantize_4bit`` bit-for-bit (tested)."""
    M, K = W.shape
    assert K % max(blocksize, 8) == 0
    # VMEM budget: double-buffered input tile + all 8 decoded fp32
    # planes (Mosaic schedules them eagerly) + K/8-wide work arrays;
    # NF4's 15-compare ladder keeps extra temporaries live.
    per_row = K * W.dtype.itemsize * 2 + K * 4 + (K // 8) * 4 * 6
    while tile_m > 8 and tile_m * per_row > 5 * 2**20:
        tile_m //= 2
    while M % tile_m:
        tile_m //= 2
    # plane-major view: wperm[m, j, c] = W[m, 8c + j]. The kernel casts
    # planes to fp32 internally — for bf16 checkpoints (HF Llama) the
    # cast is exact, so codes match the fp32 functional path bit-for-bit.
    wperm = W.reshape(M, K // 8, 8).swapaxes(1, 2)
    kernel = functools.partial(
        _quantize_kernel, blocksize=blocksize, quant_type=quant_type)
    return pl.pallas_call(
        kernel,
        grid=(M // tile_m,),
        in_specs=[pl.BlockSpec((tile_m, 8, K // 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((tile_m, K // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, K // blocksize), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, K // 8), jnp.int32),
            jax.ShapeDtypeStruct((M, K // blocksize), jnp.float32),
        ),
        interpret=interpret,
    )(wperm)


@functools.partial(
    jax.jit, static_argnames=("quant_type", "dtype", "tile_m", "interpret"))
def dequantize_4bit_pallas(
    wp: jnp.ndarray,           # [M, K/8] int32
    scales: jnp.ndarray,       # [M, K/64] fp32 (resolved, 64-granular)
    quant_type: str = "fp4",
    dtype=jnp.float32,
    tile_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dequantize packed words to ``[M, K]`` in the ORIGINAL element
    order. The kernel writes plane-major ``[M, 8, K/8]`` (TPU layouts
    punish size-8 minor interleaves in-kernel); the final transpose is
    one XLA op outside."""
    M, K8 = wp.shape
    while M % tile_m:
        tile_m //= 2
    # per-word scales: expand the per-64 scales 8x along blocks first
    kernel = functools.partial(
        _dequantize_kernel, quant_type=quant_type, out_dtype=dtype)
    planes = pl.pallas_call(
        kernel,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, K8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, K8 // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, 8, K8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 8, K8), dtype),
        interpret=interpret,
    )(wp, scales)
    # planes[m, j, c] = element (m, 8c + j)
    return planes.transpose(0, 2, 1).reshape(M, K8 * 8)