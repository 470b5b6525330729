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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv import _lut_setup, _pick_tiles, _plane_fn
from .lut import fp4_pair_patterns_all, pair_patterns_tree

__all__ = ["matmul_4bit_pallas", "matmul_4bit_pallas_stacked",
           "pair_tokens_ok", "prefill_pair_ok",
           "matmul_4bit_pair_pallas", "matmul_4bit_pair_pallas_stacked",
           "matmul_4bit_pair_prefill_pallas",
           "matmul_4bit_pair_prefill_pallas_stacked",
           "matmul_4bit_pair_manual", "matmul_4bit_pair_manual_stacked",
           "pack_pair_rows", "planar_to_pair", "pair_to_planar",
           "pair_permute_activation"]


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




# --------------------------------------------------------------------------
# SWAR row-pair layout ("pair"): the fastest FP4 decode path
# --------------------------------------------------------------------------
#
# Layout of ``wp2 [M/2, K/4]`` (same total bytes as planar): the word
# axis is BLOCK-MAJOR — ``w = r*NB + b`` with ``b`` the 64-element quant
# block (NB = K/64 of them) and ``r`` in [0, 16) the word's position
# inside the block:
#
#   r < 8  : word (i, w) covers columns c = 64b + 8r + p       (p in 0..3)
#   r >= 8 : word (i, w) covers columns c = 64b + 8(r-8) + 4 + p
#
# with the even logical row's code at bits [4p, 4p+4) and the odd row's
# at [16+4p, 16+4p+4). One ``(wp2 >> 4p) & 0x000F000F`` exposes a
# (row 2i, row 2i+1) code pair per lane; ``fp4_pair_patterns`` assembles
# both bf16 patterns SWAR-style, and Mosaic's int32->bf16 bitcast drops
# them onto sublanes 2i/2i+1 in logical row order (measured exact in
# benchmarks/bitcast_probe.py).
#
# Block-major word order makes the per-word scale row a pure lane
# TILE-REPEAT of the per-block scale row — the kernel builds it with a
# merge-bitcast (bf16 scales -> int32 row pairs) + ``pltpu.repeat``,
# no one-hot MXU expansion and no layout mismatch with the decoded
# weights (benchmarks/srep_repeat_probe.py: 135us vs 146us at
# [14336,4096]). Every conversion below is a full-lane op — no size-2/4
# minor axes, which TPU tiled layouts pad 32-64x.
#
# The layout is LOCAL to an array: a row-parallel (K-sharded) weight
# must be converted per shard (convert after sharding, or keep planar).
#
# NF4 note: pure pair-domain decodes were raced for arbitrary
# codebooks and lose on their own — the SWAR xor-select tree
# (pair_patterns_tree: 24.9 vs 30.2 tok/s e2e) and a dual per-half
# int32-pattern gather (263.5us vs 247.4us planar at [14336,4096],
# benchmarks/nf4_pair_probe.py). The winner (nf4_mechanism_probe.py,
# round 2) is the gather+TREE DUAL-ISSUE MIX in the pair layout
# (pair_patterns_mix: VPU tree and vreg-gather planes interleave,
# 199.5us vs 247.4 planar) — NF4 now defaults to the pair layout too.
# FP4 remains special: its bit-pattern arithmetic needs no table at
# all (fp4_pair_patterns_all).


def pair_tokens_ok(tokens: int, tile_t: int = 256) -> bool:
    """Whether the pair kernels can tile ``tokens`` rows: the collapsed
    token tile must equal the row count or be sublane-divisible (the
    Mosaic block rule: last-two block dims divisible by (8, 128) or
    equal to the array dims)."""
    while tokens % tile_t:
        tile_t //= 2
    return tile_t == tokens or tile_t % 8 == 0


def nibble_swap(x: jnp.ndarray) -> jnp.ndarray:
    """Swap the two nibbles of every byte of an int32 array."""
    m = 0x0F0F0F0F
    return ((x >> 4) & m) | ((x & m) << 4)


def _blockmajor(h: jnp.ndarray) -> jnp.ndarray:
    """[..., K/8] u-ordered half -> [..., K/8] (r, b)-ordered half."""
    nb = h.shape[-1] // 8
    return h.reshape(*h.shape[:-1], nb, 8).swapaxes(-1, -2).reshape(
        *h.shape[:-1], 8 * nb)


def _unblockmajor(h: jnp.ndarray) -> jnp.ndarray:
    nb = h.shape[-1] // 8
    return h.reshape(*h.shape[:-1], 8, nb).swapaxes(-1, -2).reshape(
        *h.shape[:-1], 8 * nb)


def planar_to_pair(wp: jnp.ndarray) -> jnp.ndarray:
    """Planar packed words ``[..., M, K/8]`` -> pair layout
    ``[..., M/2, K/4]``. Pure full-lane bit ops + lane reshuffles (safe
    on TPU tiled layouts; runs once at load/convert time)."""
    nse = nibble_swap(wp[..., 0::2, :])   # even rows
    nso = nibble_swap(wp[..., 1::2, :])   # odd rows
    E = (nse & 0xFFFF) | ((nso & 0xFFFF) << 16)
    O = ((nse >> 16) & 0xFFFF) | (nso & ~0xFFFF)
    return jnp.concatenate([_blockmajor(E), _blockmajor(O)], axis=-1)


def pair_to_planar(wp2: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`planar_to_pair` (used when resharding a pair
    array onto a K-split mesh axis and by the XLA fallback paths)."""
    k8 = wp2.shape[-1] // 2
    E = _unblockmajor(wp2[..., :k8])
    O = _unblockmajor(wp2[..., k8:])
    nse = (E & 0xFFFF) | ((O & 0xFFFF) << 16)
    nso = ((E >> 16) & 0xFFFF) | (O & ~0xFFFF)
    we = nibble_swap(nse)
    wo = nibble_swap(nso)
    inter = jnp.stack([we, wo], axis=-2)          # [..., M/2, 2, K/8]
    return inter.reshape(*wp2.shape[:-2], 2 * wp2.shape[-2], k8)


def pack_pair_rows(packed_u8: jnp.ndarray, rows: int,
                   cols: int) -> jnp.ndarray:
    """bnb flat packed bytes -> pair layout ``[rows/2, cols/4]``."""
    from .gemv import pack_i32_rows

    return planar_to_pair(pack_i32_rows(packed_u8, rows, cols))


def pack_scale_pairs(scales: jnp.ndarray) -> jnp.ndarray:
    """fp32/bf16 scales ``[..., M, NB]`` -> merged bf16 row-pair words
    ``int32 [..., M/2, NB]`` (row 2i in the LOW half — the layout
    ``pltpu.bitcast(bf16 [TM, NB], int32)`` produces in-kernel, so the
    pair kernels consume this storage with zero per-step transform).
    This is the ``scales_dtype="bf16x2"`` storage: half the fp32 scale
    bytes at the pair path's own bf16 scale-rounding numerics class."""
    sb = scales.astype(jnp.bfloat16)
    M, NB = sb.shape[-2], sb.shape[-1]
    pairs = sb.reshape(*sb.shape[:-2], M // 2, 2, NB)
    # bitcast_convert_type packs the MINOR axis little-endian: index 0
    # (the even row) lands in the low 16 bits
    return jax.lax.bitcast_convert_type(
        pairs.swapaxes(-1, -2), jnp.int32)


def unpack_scale_pairs(packed: jnp.ndarray,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`pack_scale_pairs`:
    ``int32 [..., M/2, NB] -> [..., M, NB]`` (bf16 values widened)."""
    pairs = jax.lax.bitcast_convert_type(packed, jnp.bfloat16)
    M2, NB = packed.shape[-2], packed.shape[-1]
    return pairs.swapaxes(-1, -2).reshape(
        *packed.shape[:-2], 2 * M2, NB).astype(dtype)


def _scale_pairs(s, out_factor):
    """In-kernel: scale block -> merged int32 row-pair scale words
    ``[TM2, NB]``. Accepts float ``[TM, NB]`` (merge-bitcast) or the
    pre-packed int32 ``[TM2, NB]`` storage (pass-through; out_factor
    applied in the bf16 view)."""
    from jax.experimental.pallas import tpu as pltpu

    if s.dtype == jnp.int32:
        if out_factor != 1.0:
            sf = (pltpu.bitcast(s, jnp.bfloat16)
                  * jnp.bfloat16(out_factor))
            return pltpu.bitcast(sf, jnp.int32)
        return s
    sf = s.astype(jnp.bfloat16)
    if out_factor != 1.0:
        sf = sf * jnp.bfloat16(out_factor)
    return pltpu.bitcast(sf, jnp.int32)


def pair_permute_activation(x: jnp.ndarray) -> jnp.ndarray:
    """``[T, K] -> [T, 4, K/4]`` matching the pair layout's block-major
    column map: ``xp[t, p, r*NB+b] = x[t, 64b + 8r + p]`` for ``r < 8``,
    odd-nibble planes (``+4+p``) in the second half."""
    T, K = x.shape
    xa = x.reshape(T, K // 8, 8).swapaxes(1, 2)    # [T, 8, K/8]
    return jnp.concatenate(
        [_blockmajor(xa[:, :4, :]), _blockmajor(xa[:, 4:, :])], axis=2)


def pair_patterns_mix(words, tbl128, table, n_gather: int = 2):
    """Arbitrary-codebook pair decode splitting the four plane outputs
    between the GATHER unit (planes ``< n_gather``: two 16-entry
    dynamic gathers of the bf16 pattern halves) and the VPU xor-select
    tree (remaining planes). Mosaic issues the two resources
    concurrently — measured 199.5us vs 247.4us planar / 294.9us
    all-tree / 263.1us all-gather at [14336,4096] T=1 on v5e
    (benchmarks/nf4_mechanism_probe.py). ``tbl128`` is the broadcast
    ``[TM2, 128]`` pattern table operand (16 real entries)."""
    from .gemv import _take16_chunked

    outs = []
    for p in range(n_gather):
        lo = (words >> (4 * p)) & 15
        hi = (words >> (16 + 4 * p)) & 15
        outs.append(_take16_chunked(tbl128, lo)
                    | (_take16_chunked(tbl128, hi) << 16))
    outs += [pair_patterns_tree(words, 4 * p, table)
             for p in range(n_gather, 4)]
    return outs


def pair_patterns_mix_bt(words, tbl128, table):
    """Gather+BYTE-TREE mix: planes 0, 2 through the dynamic gather and
    planes 1, 3 through ONE hi/lo byte-field radix-4 tree over the odd
    nibble plane (ops/lut.pair_patterns_byte_pair) — the plane split
    respects the byte pairing (planes 1 and 3 share the ``(w>>4)&0x0F…``
    nibble plane), so the tree side costs one pair of byte trees
    (~82 ops) instead of two half-word radix-2 trees (~110 ops) while
    the gather unit runs the other two planes concurrently. Candidate
    replacement for :func:`pair_patterns_mix`; raced on chip by
    benchmarks/nf4_mechanism_probe.py (mode mix_g02bt)."""
    from .gemv import _take16_chunked
    from .lut import pair_patterns_byte_pair

    outs = [None] * 4
    for p in (0, 2):
        lo = (words >> (4 * p)) & 15
        hi = (words >> (16 + 4 * p)) & 15
        outs[p] = (_take16_chunked(tbl128, lo)
                   | (_take16_chunked(tbl128, hi) << 16))
    outs[1], outs[3] = pair_patterns_byte_pair(words, table, odd=True)
    return outs


def _pattern_table(table) -> jnp.ndarray:
    """``[1, 128]`` int32 operand holding the 16 bf16 bit patterns of a
    codebook (zero-padded), for the in-kernel dynamic gather."""
    import ml_dtypes
    import numpy as np

    pat = np.asarray(np.asarray(table, np.float32).astype(
        ml_dtypes.bfloat16)).view(np.uint16).astype(np.int64)
    buf = np.zeros((1, 128), np.int32)
    buf[0, :16] = pat.astype(np.int32)
    return jnp.asarray(buf)


def _pair_fn(quant_type: str, decode: Optional[str] = None):
    """``(pair_fn, out_factor, table_or_None)``: ``pair_fn`` maps words
    (and, when a table is returned, the broadcast ``[1, 128]`` pattern
    table) to the 4 int32 outputs of packed bf16 pattern pairs;
    ``out_factor`` is folded into srep (FP4 decodes RAW values,
    codebook x 12). FP4 default is the byte-SWAR all-shifts decode
    (subnormal blend amortized over 4 codes/byte-pass — 119.0us vs
    130.9us per-shift at [14336,4096] T=1, pair_decode_probe.py);
    ``decode`` ∈ {"mixg0", "mixg02"} routes 1 or 2 FP4 planes through
    the dynamic-gather unit instead (QuantConfig.fp4_decode — the
    kernel is VPU-bound, so gather planes overlap the ALU work; raced
    in benchmarks/manual_split_probe.py). Arbitrary codebooks (NF4) use
    the gather+tree dual-issue mix."""
    if quant_type == "fp4":
        if decode == "arith_sr":
            from .lut import fp4_pair_patterns_all_sr

            return fp4_pair_patterns_all_sr, 1.0 / 12.0, None
        if decode in ("mixg0", "mixg02"):
            from ..quant.codebooks import FP4_CODE
            from .lut import fp4_pair_patterns_mix

            planes = (0,) if decode == "mixg0" else (0, 2)
            raw = tuple(12.0 * float(v) for v in FP4_CODE)
            return (lambda w, tbl128: fp4_pair_patterns_mix(
                w, tbl128, planes)), 1.0 / 12.0, raw
        return fp4_pair_patterns_all, 1.0 / 12.0, None
    from ..quant.codebooks import get_4bit_code

    code = get_4bit_code(quant_type)
    if decode == "mix_bt":
        return ((lambda w, tbl128: pair_patterns_mix_bt(w, tbl128, code)),
                1.0, tuple(float(v) for v in code))
    if decode == "mix_g3":
        return ((lambda w, tbl128: pair_patterns_mix(w, tbl128, code,
                                                     n_gather=3)),
                1.0, tuple(float(v) for v in code))
    return ((lambda w, tbl128: pair_patterns_mix(w, tbl128, code)),
            1.0, tuple(float(v) for v in code))


def _pair_kernel(wp_ref, xp_ref, s_ref, *rest, out_factor, kc4,
                 pair_fn=fp4_pair_patterns_all, has_tbl=False):
    if has_tbl:
        tbl_ref, o_ref = rest
    else:
        (o_ref,) = rest
    wp = wp_ref[:] if len(wp_ref.shape) == 2 else wp_ref[0]  # [TM2, kc4]
    s = s_ref[:] if len(s_ref.shape) == 2 else s_ref[0]      # [TM, NB]
    tm2 = wp.shape[0]
    tm = 2 * tm2
    k_id = pl.program_id(2)

    # Per-word scales: the block-major word order makes them a pure
    # lane tile-repeat of the per-block scale row. Merge-bitcast packs
    # scale row pairs the same way the decode bitcast unpacks weight
    # row pairs, so srep lands in the decoded weights' layout class
    # (the bf16 scale rounding is this path's numerics class).
    nb_total = s.shape[1]
    sp = _scale_pairs(s, out_factor)                      # [TM2, NB]
    srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // nb_total, axis=1),
                         jnp.bfloat16)                    # [TM, kc4]

    tt = xp_ref.shape[0]
    part = jnp.zeros((tt, tm), jnp.float32)
    if has_tbl:
        tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
        Ds = pair_fn(wp, tbl128)                          # 4x [TM2, kc4]
    else:
        Ds = pair_fn(wp)                                  # 4x [TM2, kc4]
    for p in range(4):
        D = Ds[p]
        Wp = pltpu.bitcast(D, jnp.bfloat16)               # [TM, kc4]
        Wj = Wp * srep
        xj = xp_ref[:, p, :].astype(jnp.bfloat16)         # [TT, kc4]
        part = part + jax.lax.dot_general(
            xj, Wj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [TT, TM]

    @pl.when(k_id == 0)
    def _():
        o_ref[:] = part

    @pl.when(k_id != 0)
    def _():
        o_ref[:] = o_ref[:] + part


def _pair_vmem_est(tile_t: int, tile_m: int, kc4: int, nb_total: int,
                   x_itemsize: int, s_itemsize: int = 4) -> int:
    """Scoped-VMEM estimate (bytes) for one pair-kernel grid step:
    double-buffered operand/output blocks plus the kernel's live
    intermediates (4 decoded int32 planes, srep + product bf16, fp32
    accumulator). Mosaic's real scoped allocation runs ~1.2-1.3x this
    model (measured anchors, chain_r3b 2026-08-18: paged stacked
    t256/tm512/kc896/x-bf16 est 13.6M vs 17.34M actual; prefill
    t256/tm512/kc896/x-fp32 est 15.4M vs 18.13M actual), so callers
    budget against _PAIR_VMEM_BUDGET = 11.5M for the 16M limit."""
    nb_lanes = -(-nb_total // 128) * 128
    tm2 = tile_m // 2
    blocks = 2 * (tm2 * kc4 * 4                      # wp2
                  + tile_t * 4 * kc4 * x_itemsize    # xp
                  + tile_m * nb_lanes * s_itemsize   # scales
                  + tile_t * tile_m * 4)             # out
    live = (4 * tm2 * kc4 * 4                        # decoded planes
            + 2 * tile_m * kc4 * 2                   # srep + product
            + tile_t * tile_m * 4)                   # accumulator
    return blocks + live


_PAIR_VMEM_BUDGET = 11_500_000


def _pick_tiles_pair(M: int, K4: int, tile_m: Optional[int],
                     tile_t: int = 1, x_itemsize: int = 2):
    """(tile_m, kc4) for the pair kernel. kc4 must be a multiple of
    NB = K4/16 so every chunk covers whole r-slices of the block-major
    word order (the scale tile-repeat requires it). tile_m shrinks
    until the per-step scoped-VMEM estimate fits the budget — at
    decode shapes (tile_t <= 8) this keeps the measured-fast tm 512
    band; at prefill/admission shapes (tile_t 128-256) the activation
    and output blocks dominate and tm drops (the old tile_t-blind
    picker compiled 17.3-18.1M scoped allocations at [4096,14336]
    t256 — over the 16M limit, chain_r3b)."""
    nb = K4 // 16
    if K4 % 128:
        kc4 = K4
    else:
        kc4 = next((d for d in range(min(K4, 1024), 0, -128)
                    if K4 % d == 0 and d % nb == 0), K4)
    if tile_m is None:
        tile_m = 512
        while tile_m > 128 and _pair_vmem_est(
                tile_t, tile_m, kc4, K4 // 16,
                x_itemsize) >= _PAIR_VMEM_BUDGET:
            tile_m //= 2
    while M % tile_m:
        tile_m //= 2
    if tile_m % 2:
        tile_m *= 2
    return tile_m, kc4


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "tile_m", "tile_t", "interpret",
                     "decode"),
)
def matmul_4bit_pair_pallas(
    wp2: jnp.ndarray,      # [M/2, K/4] int32 pair layout
    scales: jnp.ndarray,   # [M, K/64] float
    x: jnp.ndarray,        # [T, K]
    quant_type: str = "fp4",
    tile_m: Optional[int] = None,
    tile_t: int = 256,
    interpret: bool = False,
    decode: Optional[str] = None,
) -> jnp.ndarray:
    """FP4-only fused dequant+matmul via SWAR pair decode: two bf16
    weight patterns are assembled per int32 lane (~9 VPU ops per 2
    codes vs ~13 per code for the planar fp4_bits path) and bitcast
    directly into the MXU operand. Numerics identical to
    ``matmul_4bit_pallas`` (same bf16 weight/scale rounding class).
    Measured on v5e at [14336,4096] T=1: 145us vs planar 173us."""
    M2, K4 = wp2.shape
    M, K = 2 * M2, 4 * K4
    T = x.shape[0]
    assert x.shape[1] == K
    spacked = scales.dtype == jnp.int32      # bf16x2 packed row pairs
    srows = M2 if spacked else M
    assert scales.shape == (srows, K // 64), (scales.shape, srows)
    while T % tile_t:
        tile_t //= 2
    tile_t = min(tile_t, T)
    tile_m, kc4 = _pick_tiles_pair(M, K4, tile_m, tile_t,
                                   x.dtype.itemsize)

    xp = pair_permute_activation(x)

    pair_fn, out_factor, tbl_vals = _pair_fn(quant_type, decode)
    has_tbl = tbl_vals is not None
    kernel = functools.partial(_pair_kernel, out_factor=out_factor,
                               kc4=kc4, pair_fn=pair_fn, has_tbl=has_tbl)
    in_specs = [
        pl.BlockSpec((tile_m // 2, kc4), lambda t, i, kq: (i, kq),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_t, 4, kc4), lambda t, i, kq: (t, 0, kq),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m // 2 if spacked else tile_m, K // 64),
                     lambda t, i, kq: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [wp2, xp, scales]
    if has_tbl:
        in_specs.append(pl.BlockSpec((1, 128), lambda t, i, kq: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(_pattern_table(tbl_vals))
    out = pl.pallas_call(
        kernel,
        grid=(T // tile_t, M // tile_m, K4 // kc4),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_t, tile_m),
                               lambda t, i, kq: (t, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * M * K,
            bytes_accessed=M2 * K4 * 4 + T * K * 4 + T * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "tile_m", "tile_t", "interpret",
                     "decode"),
)
def matmul_4bit_pair_pallas_stacked(
    wp2: jnp.ndarray,        # [L, M/2, K/4] int32 pair layout
    scales: jnp.ndarray,     # [L, M, K/64] float
    x: jnp.ndarray,          # [T, K]
    layer_idx: jnp.ndarray,  # scalar int32
    quant_type: str = "fp4",
    tile_m: Optional[int] = None,
    tile_t: int = 256,
    interpret: bool = False,
    decode: Optional[str] = None,
) -> jnp.ndarray:
    """Layer-indexed pair-decode matmul over stacked weights (scalar
    prefetch reads layer ``i`` straight from the stacked HBM buffer)."""
    L, M2, K4 = wp2.shape
    M, K = 2 * M2, 4 * K4
    T = x.shape[0]
    assert x.shape[1] == K
    spacked = scales.dtype == jnp.int32      # bf16x2 packed row pairs
    srows = M2 if spacked else M
    assert scales.shape == (L, srows, K // 64)
    while T % tile_t:
        tile_t //= 2
    tile_t = min(tile_t, T)
    tile_m, kc4 = _pick_tiles_pair(M, K4, tile_m, tile_t,
                                   x.dtype.itemsize)
    xp = pair_permute_activation(x)

    pair_fn, out_factor, tbl_vals = _pair_fn(quant_type, decode)
    has_tbl = tbl_vals is not None

    if has_tbl:
        def k_wrap(idx_ref, wp_ref, xp_ref, s_ref, tbl_ref, o_ref):
            _pair_kernel(wp_ref[0], xp_ref, s_ref[0], tbl_ref, o_ref,
                         out_factor=out_factor, kc4=kc4,
                         pair_fn=pair_fn, has_tbl=True)
    else:
        def k_wrap(idx_ref, wp_ref, xp_ref, s_ref, o_ref):
            _pair_kernel(wp_ref[0], xp_ref, s_ref[0], o_ref,
                         out_factor=out_factor, kc4=kc4, pair_fn=pair_fn)

    in_specs = [
        pl.BlockSpec((1, tile_m // 2, kc4),
                     lambda t, i, kq, idx: (idx[0], i, kq)),
        pl.BlockSpec((tile_t, 4, kc4),
                     lambda t, i, kq, idx: (t, 0, kq)),
        pl.BlockSpec((1, tile_m // 2 if spacked else tile_m, K // 64),
                     lambda t, i, kq, idx: (idx[0], i, 0)),
    ]
    operands = [wp2, xp, scales]
    if has_tbl:
        in_specs.append(pl.BlockSpec((1, 128),
                                     lambda t, i, kq, idx: (0, 0)))
        operands.append(_pattern_table(tbl_vals))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // tile_t, M // tile_m, K4 // kc4),
        in_specs=in_specs,
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
            bytes_accessed=M2 * K4 * 4 + T * K * 4 + T * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)
    return out


# ---------------------------------------------------------------------------
# Prefill-shaped pair kernel (round 5)
#
# The decode-band pair kernels grid over (T, M, K) with T OUTERMOST, so
# at prefill shapes every T-tile re-fetches AND re-decodes the weight
# tile; measured e2e they spend ~2x their standalone projection
# (chain_r5i: 197 ms of pallas time per T=512 prefill call vs the dense
# path's 102 ms program). This variant grids over (M, K) only, keeps
# the ENTIRE permuted activation resident in VMEM, decodes each weight
# tile ONCE into four bf16 plane matrices, and loops the T tiles
# in-kernel — the "decode once, MXU across all T" shape the dense path
# approximates by materializing weights through HBM, without the
# 235 MB/layer materialization. T is capped by the VMEM residency of
# the activation block (callers chunk larger T).
# ---------------------------------------------------------------------------


def _pair_prefill_kernel(wp_ref, xp_ref, s_ref, *rest, out_factor, kc4,
                         tile_t, pair_fn=fp4_pair_patterns_all,
                         has_tbl=False):
    if has_tbl:
        tbl_ref, o_ref = rest
    else:
        (o_ref,) = rest
    wp = wp_ref[:] if len(wp_ref.shape) == 2 else wp_ref[0]  # [TM2, kc4]
    s = s_ref[:] if len(s_ref.shape) == 2 else s_ref[0]
    tm2 = wp.shape[0]
    tm = 2 * tm2
    k_id = pl.program_id(1)

    nb_total = s.shape[1]
    sp = _scale_pairs(s, out_factor)                      # [TM2, NB]
    srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // nb_total, axis=1),
                         jnp.bfloat16)                    # [TM, kc4]
    if has_tbl:
        tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
        Ds = pair_fn(wp, tbl128)
    else:
        Ds = pair_fn(wp)
    # decode ONCE; all four plane matrices stay live across the T loop
    Wjs = [pltpu.bitcast(Ds[p], jnp.bfloat16) * srep for p in range(4)]

    T = xp_ref.shape[0]
    for t0 in range(0, T, tile_t):
        part = jnp.zeros((tile_t, tm), jnp.float32)
        for p in range(4):
            xj = xp_ref[t0:t0 + tile_t, p, :].astype(jnp.bfloat16)
            part = part + jax.lax.dot_general(
                xj, Wjs[p], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [tile_t, TM]

        @pl.when(k_id == 0)
        def _(part=part, t0=t0):
            o_ref[t0:t0 + tile_t, :] = part

        @pl.when(k_id != 0)
        def _(part=part, t0=t0):
            o_ref[t0:t0 + tile_t, :] = o_ref[t0:t0 + tile_t, :] + part


def _prefill_vmem_est(T, tile_t, tile_m, kc4, nb_total, x_itemsize,
                      s_itemsize) -> int:
    nb_lanes = -(-nb_total // 128) * 128
    tm2 = tile_m // 2
    blocks = 2 * (tm2 * kc4 * 4                      # wp2
                  + T * 4 * kc4 * x_itemsize         # full-T activation
                  + tile_m * nb_lanes * s_itemsize   # scales
                  + T * tile_m * 4)                  # out
    live = (4 * tm2 * kc4 * 4                        # decoded planes
            + 4 * tile_m * kc4 * 2                   # 4 live Wj planes
            + tile_m * kc4 * 2                       # srep
            + tile_t * tile_m * 4)                   # partial
    return blocks + live


def _pick_tiles_pair_prefill(M, K4, T, x_itemsize, s_itemsize=4):
    """(tile_m, kc4, tile_t) for the prefill pair kernel, or None when
    no configuration fits the scoped-VMEM budget (callers fall back to
    the dense path)."""
    nb = K4 // 16
    tile_t = min(T, 256)
    while T % tile_t:
        tile_t //= 2
    for kc4 in [d for d in range(min(K4, 896), 0, -nb)
                if K4 % d == 0 and d % nb == 0] or [K4]:
        for tile_m in (512, 256, 128):
            if M % tile_m:
                continue
            if _prefill_vmem_est(T, tile_t, tile_m, kc4, K4 // 16,
                                 x_itemsize,
                                 s_itemsize) < _PAIR_VMEM_BUDGET:
                return tile_m, kc4, tile_t
    return None


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "interpret", "decode"),
)
def matmul_4bit_pair_prefill_pallas(
    wp2: jnp.ndarray,      # [M/2, K/4] int32 pair layout
    scales: jnp.ndarray,   # [M, K/64] float or packed int32 [M/2, K/64]
    x: jnp.ndarray,        # [T, K]
    quant_type: str = "fp4",
    interpret: bool = False,
    decode: Optional[str] = None,
) -> jnp.ndarray:
    M2, K4 = wp2.shape
    M, K = 2 * M2, 4 * K4
    T = x.shape[0]
    spacked = scales.dtype == jnp.int32
    s_item = 2 if spacked else scales.dtype.itemsize
    tiles = _pick_tiles_pair_prefill(M, K4, T, 2, s_item)
    assert tiles is not None, "caller must check prefill_pair_ok"
    tile_m, kc4, tile_t = tiles

    xp = pair_permute_activation(x.astype(jnp.bfloat16))
    pair_fn, out_factor, tbl_vals = _pair_fn(quant_type, decode)
    has_tbl = tbl_vals is not None
    kernel = functools.partial(
        _pair_prefill_kernel, out_factor=out_factor, kc4=kc4,
        tile_t=tile_t, pair_fn=pair_fn, has_tbl=has_tbl)
    in_specs = [
        pl.BlockSpec((tile_m // 2, kc4), lambda i, kq: (i, kq)),
        pl.BlockSpec((T, 4, kc4), lambda i, kq: (0, 0, kq)),
        pl.BlockSpec((tile_m // 2 if spacked else tile_m, K // 64),
                     lambda i, kq: (i, 0)),
    ]
    operands = [wp2, xp, scales]
    if has_tbl:
        in_specs.append(pl.BlockSpec((1, 128), lambda i, kq: (0, 0)))
        operands.append(_pattern_table(tbl_vals))
    return pl.pallas_call(
        kernel,
        grid=(M // tile_m, K4 // kc4),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, tile_m), lambda i, kq: (0, i)),
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * M * K,
            bytes_accessed=M2 * K4 * 4 + T * K * 2 + T * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("quant_type", "interpret", "decode"),
)
def matmul_4bit_pair_prefill_pallas_stacked(
    wp2: jnp.ndarray,        # [L, M/2, K/4]
    scales: jnp.ndarray,     # [L, M, K/64] float or [L, M/2, K/64] int32
    x: jnp.ndarray,          # [T, K]
    layer_idx: jnp.ndarray,  # scalar int32
    quant_type: str = "fp4",
    interpret: bool = False,
    decode: Optional[str] = None,
) -> jnp.ndarray:
    """Layer-indexed prefill pair kernel (scalar-prefetch stacked
    weights, same decode-once/T-loop body)."""
    L, M2, K4 = wp2.shape
    M, K = 2 * M2, 4 * K4
    T = x.shape[0]
    spacked = scales.dtype == jnp.int32
    s_item = 2 if spacked else scales.dtype.itemsize
    tiles = _pick_tiles_pair_prefill(M, K4, T, 2, s_item)
    assert tiles is not None, "caller must check prefill_pair_ok"
    tile_m, kc4, tile_t = tiles

    xp = pair_permute_activation(x.astype(jnp.bfloat16))
    pair_fn, out_factor, tbl_vals = _pair_fn(quant_type, decode)
    has_tbl = tbl_vals is not None

    if has_tbl:
        def k_wrap(idx_ref, wp_ref, xp_ref, s_ref, tbl_ref, o_ref):
            _pair_prefill_kernel(wp_ref[0], xp_ref, s_ref[0], tbl_ref,
                                 o_ref, out_factor=out_factor, kc4=kc4,
                                 tile_t=tile_t, pair_fn=pair_fn,
                                 has_tbl=True)
    else:
        def k_wrap(idx_ref, wp_ref, xp_ref, s_ref, o_ref):
            _pair_prefill_kernel(wp_ref[0], xp_ref, s_ref[0], o_ref,
                                 out_factor=out_factor, kc4=kc4,
                                 tile_t=tile_t, pair_fn=pair_fn)

    in_specs = [
        pl.BlockSpec((1, tile_m // 2, kc4),
                     lambda i, kq, idx: (idx[0], i, kq)),
        pl.BlockSpec((T, 4, kc4), lambda i, kq, idx: (0, 0, kq)),
        pl.BlockSpec((1, tile_m // 2 if spacked else tile_m, K // 64),
                     lambda i, kq, idx: (idx[0], i, 0)),
    ]
    operands = [wp2, xp, scales]
    if has_tbl:
        in_specs.append(pl.BlockSpec((1, 128),
                                     lambda i, kq, idx: (0, 0)))
        operands.append(_pattern_table(tbl_vals))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // tile_m, K4 // kc4),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, tile_m), lambda i, kq, idx: (0, i)),
    )
    return pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * M * K,
            bytes_accessed=M2 * K4 * 4 + T * K * 2 + T * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)


def prefill_pair_ok(M: int, K4: int, T: int,
                    s_itemsize: int = 4) -> bool:
    """Whether the prefill pair kernel has a VMEM-feasible tiling for
    these shapes (x is held resident: large T needs caller chunking)."""
    return (M % 2 == 0 and T % 8 == 0
            and _pick_tiles_pair_prefill(M, K4, T, 2, s_itemsize)
            is not None)


# x-residency cap per prefill-kernel call; larger T chunks through it
PREFILL_PAIR_CHUNK_T = 512


def pair_prefill_matmul(wp2, scales, x, quant_type: str,
                        decode: Optional[str] = None,
                        layer_idx=None, interpret: bool = False):
    """Prefill matmul via the decode-once pair kernel, chunking T into
    <=PREFILL_PAIR_CHUNK_T slices (the VMEM activation-residency cap;
    each chunk re-streams+re-decodes the weights, so chunks are as
    large as residency allows)."""
    T = x.shape[0]
    step = PREFILL_PAIR_CHUNK_T
    outs = []
    for t0 in range(0, T, step):
        xc = x[t0:t0 + step]
        if layer_idx is None:
            outs.append(matmul_4bit_pair_prefill_pallas(
                wp2, scales, xc, quant_type=quant_type, decode=decode,
                interpret=interpret))
        else:
            outs.append(matmul_4bit_pair_prefill_pallas_stacked(
                wp2, scales, xc, layer_idx, quant_type=quant_type,
                decode=decode, interpret=interpret))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# Manual double-buffered DMA pipeline (decode band)
#
# The grid-pipelined pair kernel's measured time decomposes EXACTLY
# additively on v5e (DMA floor 53.8us + affine decode 34.5us + subnormal
# blend 30.2us = 118.5us at [14336,4096] T=1) — the automatic Pallas
# pipeline does not overlap the weight stream with the VPU decode at
# these shapes. This variant keeps the weights in HBM (memory_space ANY)
# and streams M-chunks through two VMEM slots with explicitly issued
# async copies: chunk i+1's DMA is in flight while chunk i decodes, so
# steady-state time is max(DMA, compute) instead of their sum.
# Scales/activations stay ordinary VMEM operands (fetched once — they
# are ~11%/~0.1% of the bytes). Decode-band only (T small): prefill
# shapes amortize decode over token tiles in the grid kernel instead.
# ---------------------------------------------------------------------------


def manual_vmem_ok(M: int, K: int, tokens: int,
                   scales_itemsize: int = 4) -> bool:
    """Whether the manual-pipeline kernel's whole-operand VMEM residency
    fits the scoped-vmem budget: unlike the grid kernels, scales / the
    activation / the output are single un-tiled VMEM operands, so a
    huge-M projection (the 128256-row lm_head: 32.8 MB of fp32 scales)
    overflows the 16 MB scoped limit at compile time. Callers fall back
    to the grid kernel above this budget (measured on v5e: grid and
    manual tie at decode shapes anyway — the pair kernel is
    compute-bound, round-3 manual_split_probe)."""
    tm = _pick_tile_manual(M, K // 4)
    if not tm:
        return False
    lanes = -(-(K // 64) // 128) * 128          # VMEM lane padding
    fixed = (M * lanes * scales_itemsize        # scales (lane-padded)
             + tokens * M * 4                   # output
             + tokens * K * 4                   # permuted activation
             + tm * K)                          # two weight slots
    return fixed <= 10 * 2**20


def _pick_tile_manual(M: int, K4: int) -> int:
    """M-chunk rows for the manual pipeline: largest of 512/256/128 that
    divides M (lane-slice writes of the output need 128-multiples) AND
    keeps the two weight slots within ~2 MB of VMEM (2 x (tm/2) x K4
    words). The decoded plane intermediates scale with the slot size
    and live on the same scoped stack (measured: the 8B down matmul at
    tm 512 allocates 20.6 MB scoped vs the 16 MB limit), so wide-K
    projections drop to tm 128."""
    for tm in (512, 256, 128):
        if M % tm == 0 and tm * K4 * 4 <= 2 * 2**20:
            return tm
    return 0


def _manual_kernel_body(dma_src, s_slice, xp_ref, tbl_ref, o_ref, *,
                        nchunk, tm, K4, nb_total, pair_fn, out_factor,
                        has_tbl):
    """``dma_src(ci)`` -> HBM ref slice for chunk ``ci``; ``s_slice(ci)``
    -> the chunk's ``[tm, nb_total]`` scales VALUE."""
    tm2 = tm // 2
    tt = xp_ref.shape[0]
    xs = [xp_ref[:, p, :].astype(jnp.bfloat16) for p in range(4)]

    def scoped(wbuf, wsem):
        def dma(slot, ci):
            return pltpu.make_async_copy(dma_src(ci), wbuf.at[slot],
                                         wsem.at[slot])

        dma(0, 0).start()

        def loop(ci, _):
            slot = jax.lax.rem(ci, 2)
            nslot = jax.lax.rem(ci + 1, 2)

            @pl.when(ci + 1 < nchunk)
            def _():
                dma(nslot, ci + 1).start()

            dma(slot, ci).wait()
            wp = wbuf[slot]
            sp = _scale_pairs(s_slice(ci), out_factor)
            srep = pltpu.bitcast(
                pltpu.repeat(sp, K4 // nb_total, axis=1), jnp.bfloat16)
            if has_tbl:
                tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
                Ds = pair_fn(wp, tbl128)
            else:
                Ds = pair_fn(wp)
            part = jnp.zeros((tt, tm), jnp.float32)
            for p in range(4):
                Wj = pltpu.bitcast(Ds[p], jnp.bfloat16) * srep
                part = part + jax.lax.dot_general(
                    xs[p], Wj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[:, pl.ds(ci * tm, tm)] = part
            return 0

        jax.lax.fori_loop(0, nchunk, loop, 0)

    pl.run_scoped(
        scoped,
        wbuf=pltpu.VMEM((2, tm2, K4), jnp.int32),
        wsem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("quant_type", "tile_m", "interpret",
                              "decode"))
def matmul_4bit_pair_manual(
    wp2: jnp.ndarray,      # [M/2, K/4] int32 pair layout
    scales: jnp.ndarray,   # [M, K/64] float
    x: jnp.ndarray,        # [T, K]
    quant_type: str = "fp4",
    tile_m: Optional[int] = None,
    interpret: bool = False,
    decode: Optional[str] = None,
) -> jnp.ndarray:
    """Pair-decode matmul with the manual double-buffered weight
    stream. Numerics identical to :func:`matmul_4bit_pair_pallas`
    (same decode, same bf16 rounding class, same accumulation order
    within a row)."""
    M2, K4 = wp2.shape
    M, K = 2 * M2, 4 * K4
    T = x.shape[0]
    assert x.shape[1] == K
    spacked = scales.dtype == jnp.int32      # bf16x2 packed row pairs
    assert scales.shape == ((M2 if spacked else M), K // 64)
    tm = tile_m or _pick_tile_manual(M, K4)
    assert tm and M % tm == 0 and tm % 128 == 0
    pair_fn, out_factor, tbl_vals = _pair_fn(quant_type, decode)
    has_tbl = tbl_vals is not None
    xp = pair_permute_activation(x)

    def kern(wp_ref, xp_ref, s_ref, *rest):
        if has_tbl:
            tbl_ref, o_ref = rest
        else:
            tbl_ref, (o_ref,) = None, rest
        _manual_kernel_body(
            lambda ci: wp_ref.at[pl.ds(ci * (tm // 2), tm // 2), :],
            (lambda ci: s_ref[pl.ds(ci * (tm // 2), tm // 2), :])
            if spacked else
            (lambda ci: s_ref[pl.ds(ci * tm, tm), :]),
            xp_ref, tbl_ref, o_ref,
            nchunk=M // tm, tm=tm, K4=K4, nb_total=K // 64,
            pair_fn=pair_fn, out_factor=out_factor, has_tbl=has_tbl)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [wp2, xp, scales]
    if has_tbl:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(_pattern_table(tbl_vals))
    return pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit, static_argnames=("quant_type", "tile_m", "interpret",
                              "decode"))
def matmul_4bit_pair_manual_stacked(
    wp2: jnp.ndarray,        # [L, M/2, K/4] int32 pair layout
    scales: jnp.ndarray,     # [L, M, K/64] float
    x: jnp.ndarray,          # [T, K]
    layer_idx: jnp.ndarray,  # scalar int32
    quant_type: str = "fp4",
    tile_m: Optional[int] = None,
    interpret: bool = False,
    decode: Optional[str] = None,
) -> jnp.ndarray:
    """Layer-indexed manual-pipeline pair matmul: weight chunk DMAs are
    aimed at layer ``layer_idx`` of the stacked HBM buffer; the layer's
    scales ride the normal grid prologue via a scalar-prefetch index
    map (one fetch per call)."""
    L, M2, K4 = wp2.shape
    M, K = 2 * M2, 4 * K4
    T = x.shape[0]
    assert x.shape[1] == K
    spacked = scales.dtype == jnp.int32      # bf16x2 packed row pairs
    assert scales.shape == (L, (M2 if spacked else M), K // 64)
    tm = tile_m or _pick_tile_manual(M, K4)
    assert tm and M % tm == 0 and tm % 128 == 0
    pair_fn, out_factor, tbl_vals = _pair_fn(quant_type, decode)
    has_tbl = tbl_vals is not None
    xp = pair_permute_activation(x)

    def kern(idx_ref, wp_ref, xp_ref, s_ref, *rest):
        if has_tbl:
            tbl_ref, o_ref = rest
        else:
            tbl_ref, (o_ref,) = None, rest
        _manual_kernel_body(
            lambda ci: wp_ref.at[idx_ref[0],
                                 pl.ds(ci * (tm // 2), tm // 2), :],
            (lambda ci: s_ref[0, pl.ds(ci * (tm // 2), tm // 2), :])
            if spacked else
            (lambda ci: s_ref[0, pl.ds(ci * tm, tm), :]),
            xp_ref, tbl_ref, o_ref,
            nchunk=M // tm, tm=tm, K4=K4, nb_total=K // 64,
            pair_fn=pair_fn, out_factor=out_factor, has_tbl=has_tbl)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((T, 4, K4), lambda g, idx: (0, 0, 0)),
        pl.BlockSpec((1, (M2 if spacked else M), K // 64),
                     lambda g, idx: (idx[0], 0, 0)),
    ]
    operands = [wp2, xp, scales]
    if has_tbl:
        in_specs.append(pl.BlockSpec((1, 128), lambda g, idx: (0, 0)))
        operands.append(_pattern_table(tbl_vals))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, M), lambda g, idx: (0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)
