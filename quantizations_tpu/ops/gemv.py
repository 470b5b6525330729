"""Fused dequant + GEMV Pallas kernels — the flagship decode path.

TPU-native replacement for the reference's production decode kernel
``kgemm_4bit_inference_naive`` (reference kernels.cu:1062-1219). Design
differences, per SURVEY.md §7:

- Packed int4 weights are read once from HBM as int32 words (8 codes per
  word, bnb byte order), streamed through VMEM by the Pallas pipeline —
  sequential, lane-aligned access (the reference kernel lost 45% of its
  sectors to uncoalesged loads and ran at 24.8% occupancy).
- Scales arrive pre-resolved as fp32 (the double-quant decode is hoisted
  to load time, fixing the per-call nested dequant at reference
  core.py:467).
- Codebook decode strategies (measured on v5e, benchmarks/lut_probe.py):
  vectorized VPU bit-arithmetic (``fp4_bits``), select-tree (``tree``),
  or an in-kernel 128-lane-chunked vector gather (``take16``).
- fp32 dequant values, fp32 accumulation (matching kernels.cu:1201-1211),
  per-64-block group reduction on the MXU, scales applied last — the
  kernel is bit-faithful to an fp32 dequantize-then-dot.
- ``gemv_4bit_pallas_stacked`` reads layer ``i`` of stacked ``[L, ...]``
  weights via a scalar-prefetch index map — inside a ``lax.scan`` over
  layers this avoids materializing a per-layer copy of the weights
  before every kernel call (which would double decode HBM traffic).

Layout algebra: word ``c`` of row ``m`` holds elements ``k = 8c .. 8c+7``.
A nibble-plane unpack yields 8 arrays ``codes_j[m, c] = code(k=8c+j)``,
so the kernel works against a permuted activation ``xp[j, c] = x[8c+j]``
and the 64-element quant block of ``(j, c)`` is ``c // 8`` independent of
``j`` — one scale array serves all planes.

Performance ceiling (measured, v5e): this fp32 GEMV kernel is VPU-bound
at ~147 GB/s vs a measured 591 GB/s streaming roof. Exact FP4 decode
costs ~17 VPU ops/code (extract 2, exponent/mantissa bit-assembly 8,
subnormal-pair select 5, sign 2) and the VPU runs ~5-8 T ops/s. Notes
from the ceiling hunt on THIS hardware generation:
- vector gathers (``take16``): Mosaic ``dynamic_gather`` costs ~30
  op-equivalents/element and is single-vreg row-local (290us vs 225us).
- pltpu.repeat TILES (not element-repeat), so per-element scale
  expansion has no cheap form here; applying scales after a local
  one-hot group-reduce matmul (exact at HIGHEST) is the efficient
  encoding for this fp32 path.
- bf16-pair SWAR decode (two values assembled per int32 lane, ~9 ops
  per 2 codes): the production MXU path. An earlier session measured
  pltpu.bitcast int32->bf16 as "scattered" at large shapes; the
  characterization in benchmarks/bitcast_probe.py shows it is in fact a
  CLEAN sublane interleave (int32 row i -> bf16 rows 2i/2i+1) at every
  probed multi-vreg shape. ops/qmatmul.py's pair kernels build on it
  and reach ~252 GB/s; this kernel remains the bit-faithful fp32
  reference (fp32 products can't ride the pair bitcast).
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

__all__ = [
    "gemv_4bit_pallas",
    "gemv_4bit_pallas_stacked",
    "pack_i32_rows",
    "permute_activation",
    "DEFAULT_LUT",
]

# Nibble position of element j within an int32 word under bnb byte order
# (byte = even<<4 | odd, bytes little-endian): element j lives at bit
# offset 8*(j//2) + (4 if j even else 0).
_SHIFTS = tuple(8 * (j // 2) + (4 - 4 * (j % 2)) for j in range(8))

# Measured-fastest default (benchmarks/lut_probe.py on TPU v5e):
# fp4_bits 253us vs tree 321us vs take16 290us at [14336,4096]
# (Mosaic dynamic_gather costs ~30 op-equivalents; arithmetic wins).
DEFAULT_LUT = "fp4_bits"


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


def _take16_chunked(tbl128, codes):
    """Gather ``tbl128[m, codes[m, c]]`` in 128-lane chunks.

    Mosaic's ``tpu.dynamic_gather`` requires operand and index shapes to
    match AND the gather (lane) dimension to fit one vreg, so the table
    lives in a ``[TM, 128]`` operand (16 real entries, zero-padded) and
    the code array is gathered 128 lanes at a time."""
    tm, k8 = codes.shape
    if k8 <= 128:
        pad = 128 - k8
        idx = (jnp.concatenate(
            [codes, jnp.zeros((tm, pad), codes.dtype)], axis=1)
            if pad else codes)
        return jnp.take_along_axis(tbl128, idx, axis=1)[:, :k8]
    outs = []
    for q in range(k8 // 128):
        chunk = codes[:, q * 128:(q + 1) * 128]
        outs.append(jnp.take_along_axis(tbl128, chunk, axis=1))
    return jnp.concatenate(outs, axis=1)


def _plane_fn(tm, tbl_ref, lut: str, lut_fn):
    """(wp, j) -> unscaled fp32 values ``[TM, K8]``
    (``plane_j[m, c]`` = codebook value of element ``8c+j``).

    ``mix<k>`` decodes planes ``j < k`` through the vector gather and the
    rest through the arithmetic/select path — the two lowerings occupy
    different issue resources, so interleaving them can beat either one
    alone (raced in benchmarks/nf4_lut_probe.py)."""
    gather = None
    if lut == "take16" or lut.startswith("mix"):
        tbl16 = tbl_ref[0, 0:1, :128]                 # [1, 128]
        tbl128 = jnp.broadcast_to(tbl16, (tm, 128))
        gather = lambda c: _take16_chunked(tbl128, c)
    if lut == "take16":
        fn_for = lambda j: gather
    elif lut.startswith("mix"):
        k = int(lut[3:])
        fn_for = lambda j: gather if j < k else lut_fn
    else:
        fn_for = lambda j: lut_fn
    return lambda wp, j: fn_for(j)((wp >> _SHIFTS[j]) & 15)


def _gemv_kernel(wp_ref, xp_ref, s_ref, tbl_ref, o_ref, *, lut, lut_fn,
                 batch, out_factor=1.0):
    """Dequant + matvec, fp32 throughout (bit-faithful to an fp32
    dequantize-then-dot, like the reference's fp32 accumulation,
    kernels.cu:1201-1211).

    Grid is 2D (row tiles x K chunks): the K split bounds live VMEM
    independently of the weight's K (at batch 4 a whole-K kernel blows
    the 16 MiB scoped-vmem limit inside the full decode program). The
    output block is revisited across the K chunks and accumulated.

    Scales are applied AFTER a per-64-block group reduction (one small
    one-hot MXU matmul at HIGHEST precision — exact for 0/1 operands);
    the chunk's block offset folds into the one-hot matrix, so the
    scales operand stays unblocked along K (it is tiny) and Mosaic never
    needs an element-repeat (pltpu.repeat tiles; wide gathers span
    vregs).
    """
    wp = wp_ref[:] if len(wp_ref.shape) == 2 else wp_ref[0]
    s = s_ref[:] if len(s_ref.shape) == 2 else s_ref[0]   # [TM, NB_total]
    tm, kc = wp.shape
    nb_total = s.shape[1]
    nbc = kc // 8
    k_id = pl.program_id(1)
    plane = _plane_fn(tm, tbl_ref, lut, lut_fn)
    accs = [jnp.zeros((tm, kc), jnp.float32) for _ in range(batch)]
    for j in range(8):
        vals = plane(wp, j)
        for b in range(batch):
            accs[b] = accs[b] + vals * xp_ref[b, j, :][None, :]
    # Local group reduction: E8[c, bl] = 1 iff chunk word c belongs to
    # LOCAL 64-element block bl — [kc, kc/8], so the reduce matmul cost
    # is K8*kc/8 per row instead of K8*NB_total (which made the down
    # projection 37% slower than gate/up for the same bytes).
    lane = jax.lax.broadcasted_iota(jnp.int32, (kc, nbc), 0)
    bl = jax.lax.broadcasted_iota(jnp.int32, (kc, nbc), 1)
    E8 = (lane // 8 == bl).astype(jnp.float32)
    # Chunk's scale slice via a tiny dynamic one-hot selector (exact
    # copy at HIGHEST precision; Mosaic has no dynamic lane slicing).
    row = jax.lax.broadcasted_iota(jnp.int32, (nb_total, nbc), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb_total, nbc), 1)
    Sel = (row == col + k_id * nbc).astype(jnp.float32)
    s_c = jnp.dot(s, Sel, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)   # [TM, nbc]
    partials = []
    for b in range(batch):
        g = jnp.dot(accs[b], E8, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        out = jnp.sum(g * s_c, axis=1)
        if out_factor != 1.0:
            # fp4_bits decodes RAW values (codebook x 12); the 1/12 is
            # applied once per OUTPUT element, not once per weight.
            out = out * jnp.float32(out_factor)
        partials.append(out)

    @pl.when(k_id == 0)
    def _init():
        for b in range(batch):
            o_ref[b, :] = partials[b]

    @pl.when(k_id != 0)
    def _accum():
        for b in range(batch):
            o_ref[b, :] = o_ref[b, :] + partials[b]


def _lut_setup(quant_type: str, lut: Optional[str], k8: int):
    if lut is None:
        lut = DEFAULT_LUT
    if lut == "fp4_bits" and quant_type != "fp4":
        # no bit-arithmetic decode for arbitrary codebooks; gather+tree
        # mix measured fastest for NF4 (benchmarks/nf4_lut_probe.py:
        # mix4 247us vs take16 260us vs tree 277us at [14336,4096])
        lut = "mix4"
    code = get_4bit_code(quant_type)
    out_factor = 1.0
    lut_fn = None
    tbl_vals = None
    if lut == "fp4_bits" or (lut.startswith("mix") and quant_type == "fp4"):
        # arithmetic planes decode RAW values (codebook x 12); the 1/12
        # folds into the scales once per block. mix's gather table is
        # scaled x12 to live in the same raw domain.
        from .lut import lut_fp4_bits_raw

        lut_fn = lut_fp4_bits_raw
        out_factor = 1.0 / 12.0
        if lut.startswith("mix"):
            tbl_vals = np.asarray(code, np.float32) * 12.0
    elif lut == "tree" or (lut.startswith("mix") and quant_type != "fp4"):
        lut_fn = make_lut("tree", code)
        if lut.startswith("mix"):
            tbl_vals = np.asarray(code, np.float32)
    if lut == "take16":
        tbl_vals = np.asarray(code, np.float32)
    if lut == "probe_linear":
        # PROBE ONLY (benchmarks): decode = code value itself (1 convert).
        # Not a valid codebook — measures the kernel's non-decode floor;
        # outputs are numerically meaningless.
        lut_fn = lambda c: c.astype(jnp.float32)
    # pad to 256 lanes so one table shape serves every strategy
    t = np.zeros((1, 1, 256), np.float32)
    if tbl_vals is not None:
        t[0, 0, :16] = tbl_vals
    return lut, lut_fn, jnp.asarray(t), out_factor


def _pick_tiles(M: int, K8: int, batch: int,
                tile_m: Optional[int]) -> tuple:
    """(tile_m, k_chunk): row tile and K-chunk so the kernel's live VMEM
    (double-buffered int32 input + decoded planes + ``batch`` fp32
    accumulators) stays bounded regardless of the weight's K.

    Bigger chunks mean fewer grid steps (each costs ~1 us of fixed
    overhead — at kc=256 the down projection paid 112 steps/call), so
    pick the LARGEST 128-multiple divisor of K8 (<=1024) that still
    fits the budget at the floor row tile of 128."""
    budget = 4 * 2**20

    def per_row(kc):
        return (2 + 2 + batch) * kc * 4

    if K8 % 128:
        k_chunk = K8                      # tiny K: one chunk (lane rule:
        # block lane dim must be 128-divisible or equal the array dim)
    else:
        cands = [d for d in range(min(K8, 1024), 0, -128)
                 if K8 % d == 0]
        k_chunk = cands[-1]
        for d in cands:
            if 128 * per_row(d) < budget:
                k_chunk = d
                break
    if tile_m is None:
        tile_m = 512
        # floor 128: the output block's lane dim must be 128-divisible
        while tile_m > 128 and tile_m * per_row(k_chunk) >= budget:
            tile_m //= 2
    while M % tile_m:
        tile_m //= 2
    return tile_m, k_chunk


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "lut", "tile_m", "interpret"),
)
def gemv_4bit_pallas(
    wp: jnp.ndarray,       # [M, K/8] int32 packed weights
    scales: jnp.ndarray,   # [M, K/64] fp32 resolved absmax
    x: jnp.ndarray,        # [B, K] activations (any float dtype)
    quant_type: str = "fp4",
    lut: Optional[str] = None,
    tile_m: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused 4-bit dequant + GEMV: ``x @ dequant(W).T`` as ``[B, M]``
    float32. ``B`` must be small (decode batch); prefill goes through
    the dequant+MXU-matmul path in nn/linear.py instead."""
    M, K8 = wp.shape
    K = K8 * 8
    B = x.shape[0]
    assert x.shape[1] == K, (x.shape, K)
    assert scales.shape == (M, K8 // 8), (scales.shape, (M, K8 // 8))
    tile_m, kc = _pick_tiles(M, K8, B, tile_m)
    lut, lut_fn, tbl, out_factor = _lut_setup(quant_type, lut, K8)
    xp = permute_activation(x.astype(jnp.float32))

    kernel = functools.partial(
        _gemv_kernel, lut=lut, lut_fn=lut_fn, batch=B,
        out_factor=out_factor)
    out = pl.pallas_call(
        kernel,
        grid=(M // tile_m, K8 // kc),
        in_specs=[
            pl.BlockSpec((tile_m, kc), lambda i, kq: (i, kq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, kc), lambda i, kq: (0, 0, kq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, K8 // 8), lambda i, kq: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tbl.shape[1], 256),
                         lambda i, kq: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_m), lambda i, kq: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * K,
            bytes_accessed=M * K8 * 4 + M * (K8 // 8) * 4 + B * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wp, xp, scales, tbl)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "lut", "tile_m", "interpret"),
)
def gemv_4bit_pallas_stacked(
    wp: jnp.ndarray,       # [L, M, K/8] int32 stacked packed weights
    scales: jnp.ndarray,   # [L, M, K/64] fp32
    x: jnp.ndarray,        # [B, K]
    layer_idx: jnp.ndarray,  # scalar int32
    quant_type: str = "fp4",
    lut: Optional[str] = None,
    tile_m: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Layer-indexed fused GEMV over stacked weights.

    The layer index is a scalar-prefetch argument feeding the BlockSpec
    index maps, so the kernel's DMAs read layer ``i`` directly from the
    stacked HBM buffer — no XLA-level slice/copy of the layer's weights
    (a ``lax.scan`` that slices its xs would otherwise add a full
    read+write of every weight byte per decode step)."""
    L, M, K8 = wp.shape
    K = K8 * 8
    B = x.shape[0]
    assert x.shape[1] == K, (x.shape, K)
    assert scales.shape == (L, M, K8 // 8)
    tile_m, kc = _pick_tiles(M, K8, B, tile_m)
    lut, lut_fn, tbl, out_factor = _lut_setup(quant_type, lut, K8)
    xp = permute_activation(x.astype(jnp.float32))

    def k_wrap(idx_ref, wp_ref, xp_ref, s_ref, tbl_ref, o_ref):
        _gemv_kernel(wp_ref, xp_ref, s_ref, tbl_ref, o_ref,
                     lut=lut, lut_fn=lut_fn, batch=B,
                     out_factor=out_factor)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // tile_m, K8 // kc),
        in_specs=[
            pl.BlockSpec((1, tile_m, kc),
                         lambda i, kq, idx: (idx[0], i, kq)),
            pl.BlockSpec((B, 8, kc), lambda i, kq, idx: (0, 0, kq)),
            pl.BlockSpec((1, tile_m, K8 // 8),
                         lambda i, kq, idx: (idx[0], i, 0)),
            pl.BlockSpec((1, tbl.shape[1], 256),
                         lambda i, kq, idx: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, tile_m), lambda i, kq, idx: (0, i)),
    )
    out = pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * K,
            bytes_accessed=M * K8 * 4 + M * (K8 // 8) * 4 + B * K * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), wp, xp, scales, tbl)
    return out
