"""In-kernel 16-entry codebook lookup strategies for 4-bit codes.

The GPU reference resolves codes through a scalar decision tree
(``dDequantizeFP4Tree``, reference kernels.cu:70-111) or a shared-memory
gather (``quant_map`` in the GEMV kernel, kernels.cu:1115-1121). Neither
maps to the TPU: the VPU has no per-lane gather from arbitrary tables, so
the lookup must be expressed as vectorized arithmetic/select ops over
(8,128) tiles. Several exact strategies are implemented here and raced in
``benchmarks/kernel_bakeoff.py`` on real hardware; the GEMV kernel takes
the strategy as a parameter.

All strategies take an int32 array of codes in [0, 15] and return float32
decoded values, bit-exact to ``table[codes]``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lut_tree", "lut_fp4_bits", "lut_take", "fp4_pair_patterns",
           "fp4_pair_patterns_all", "pair_patterns_byte_pair",
           "make_lut", "LUT_NAMES"]


def lut_tree(codes: jnp.ndarray, table: Sequence[float]) -> jnp.ndarray:
    """Balanced 4-level select tree: 15 vector selects, works for any
    16-entry table (the NF4 path). Exact."""
    t = [jnp.float32(v) for v in table]
    # level 0: select by bit 0 between adjacent entries -> 8 candidates
    b0 = (codes & 1) != 0
    l0 = [jnp.where(b0, t[2 * i + 1], t[2 * i]) for i in range(8)]
    b1 = (codes & 2) != 0
    l1 = [jnp.where(b1, l0[2 * i + 1], l0[2 * i]) for i in range(4)]
    b2 = (codes & 4) != 0
    l2 = [jnp.where(b2, l1[2 * i + 1], l1[2 * i]) for i in range(2)]
    b3 = (codes & 8) != 0
    return jnp.where(b3, l2[1], l2[0])


def lut_fp4_bits_raw(codes: jnp.ndarray) -> jnp.ndarray:
    """FP4 decode to the RAW (un-normalized) values — i.e. the codebook
    times 12. Callers fold the 1/12 into the per-block scales (one
    multiply per 64 elements instead of one per element).

    FP4 (S1E2M1, bias 3 — reference kernels.cu:29-67):

        e = (code >> 1) & 3, m = code & 1, s = code & 8
        e >= 1 -> +-2^(4-e) * (1 + m/2)
        e == 0 -> +-m * 2^-4

    For e >= 1 the fp32 bit pattern is affine in the low 3 code bits:
    ``(131<<23) + (m<<22) - (e<<23)`` where ``m<<22 - e<<23`` is just
    ``((c&1) - (c&6)) << 22``. The e == 0 pair needs one select; its
    value ``m * 2^-4`` is built multiplicatively from the m bit (no
    second select).
    """
    u = codes << 22
    m22 = u & (1 << 22)
    e23 = u & (3 << 23)
    sgn = (codes & 8) << 28
    bits_ge1 = ((131 << 23) + m22 + sgn) - e23
    # e == 0: +-m * 2^-4 -> bits = m * (123<<23) | sign
    bits_e0 = (m22 >> 22) * (123 << 23) + sgn
    bits = jnp.where(e23 == 0, bits_e0, bits_ge1)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def lut_fp4_bits(codes: jnp.ndarray, table: Sequence[float] = ()) -> jnp.ndarray:
    """FP4-specific exact decode to the normalized codebook values
    (``lut_fp4_bits_raw`` divided by 12; the product is exactly the
    fp32-rounded codebook — verified against the table in tests)."""
    return lut_fp4_bits_raw(codes) * jnp.float32(1.0 / 12.0)


def fp4_pair_patterns(words: jnp.ndarray, shift: int) -> jnp.ndarray:
    """SWAR FP4 decode of TWO codes per int32 lane into the bf16 bit
    patterns of the RAW values (codebook x 12), packed low/high half.

    ``words`` holds codes for a ROW PAIR: bits ``[shift, shift+4)`` carry
    the even row's code, bits ``[shift+16, shift+20)`` the odd row's
    (see ``pack_pair_rows``). The int32 result bitcasts to two bf16
    sublanes via Mosaic's clean row-pair interleave (int32 row i -> bf16
    rows 2i/2i+1, measured exact in benchmarks/bitcast_probe.py).

    Both 16-bit halves are assembled simultaneously with carry-safe
    arithmetic (~18 ops per 2 codes vs ~13 ops per 1 code for
    ``lut_fp4_bits_raw``):

        e >= 1: pattern = (131<<7) + (m<<6) - (e<<6)   [affine in bits]
        e == 0: pattern = m * 0x3D80                    [0 or 0.0625]

    blended per half with an XOR mask (no cross-half borrows; the
    mask is built via a bit-14 carry trick and a shift/sub expansion,
    avoiding int32 multiplies).
    """
    pair = (words >> shift) & 0x000F000F
    t1 = pair & 0x00010001                     # mantissa bit per half
    t2 = pair & 0x00060006                     # exponent bits per half
    sgn = pair & 0x00080008
    affine = (0x41804180 + (t1 << 6)) - (t2 << 6)
    e0pat = t1 * 0x3D80                        # bf16(0.0625) per half
    # mask = 0xFFFF per half iff e > 0: adding 0x3FFE carries into bit
    # 14 exactly when e != 0 (e in {0,2,4,6}; max 0x4004 < 0x8000 so
    # halves never interact), then (sb<<2) - (sb>>14) expands the bit
    # to a full 16-bit mask in both halves at once.
    sb = (t2 + 0x3FFE3FFE) & 0x40004000
    mask = (sb << 2) - (sb >> 14)
    bits = e0pat ^ ((e0pat ^ affine) & mask)
    return bits | (sgn << 12)


def fp4_pair_patterns_all(words: jnp.ndarray) -> list:
    """SWAR FP4 decode of ALL EIGHT codes of a pair-layout word into the
    four int32 pattern-pair outputs (equivalent to
    ``[fp4_pair_patterns(words, 4*p) for p in range(4)]`` — tested
    bit-identical), restructured so the expensive subnormal blend runs
    TWICE over byte fields (4 codes each) instead of four times over
    halfword fields (2 codes each).

    Byte-plane form of the pattern: ``P = R<<7 | mb<<6 | s<<15`` with
    ``R = P>>7`` a single byte (normals: ``131 - e``; 0.0625: ``123``;
    zero: ``0``), so R / the mantissa bit / the sign bit are computed
    for 4 codes per op in byte fields and only the cheap final assembly
    runs per output. Measured on v5e at [14336,4096] T=1: 119.0us vs
    130.9us for the per-shift SWAR (benchmarks/pair_decode_probe.py;
    floor without the subnormal blend: 88.3us, pure-DMA floor: 53.8us).
    """
    N0 = words & 0x0F0F0F0F
    N1 = (words >> 4) & 0x0F0F0F0F
    planes = []
    for N in (N0, N1):
        m = N & 0x01010101
        e2 = N & 0x06060606
        sg = N & 0x08080808
        e1 = e2 >> 1
        Rn = jnp.int32(np.int32(np.uint32(0x83838383))) - e1
        # bit0 per byte iff e != 0 (mask AFTER the shift: bit31 would
        # sign-extend through the arithmetic >>)
        zb = ((e2 + 0x7E7E7E7E) >> 7) & 0x01010101
        zm = zb * 0xFF                  # 0xFF per byte iff normal
        Rs = m * 0x7B                   # R = 123 for the 0.0625 code
        R = Rs ^ ((Rs ^ Rn) & zm)
        mb = m & zm
        planes.append((R, mb, sg))
    outs = []
    for p in range(4):
        R, mb, sg = planes[p & 1]
        if p < 2:   # byte 0 = even row, byte 2 = odd row
            out = ((R & 0x00FF00FF) << 7) \
                | ((mb & 0x00010001) << 6) \
                | ((sg & 0x00080008) << 12)
        else:       # bytes 1, 3
            out = (((R >> 8) & 0x00FF00FF) << 7) \
                | ((mb & 0x01000100) >> 2) \
                | ((sg & 0x08000800) << 4)
        outs.append(out)
    return outs


def fp4_pair_patterns_all_sr(words: jnp.ndarray) -> list:
    """:func:`fp4_pair_patterns_all` with the two byte-field constant
    MULTIPLIES of the subnormal blend strength-reduced to shift/sub
    chains — exact by the byte-local algebra ``sum(b_i * c * 256**i)``
    (each byte's product occupies its own byte, no carries):

      ``zb * 0xFF  == (zb << 8) - zb``
      ``m  * 0x7B  == (m << 7) - (m << 2) - m``

    Bit-identical (tested); raced against the multiply form on chip by
    benchmarks/pair_decode_probe2.py — the VPU's 32-bit integer multiply
    is a multi-op sequence, so if Mosaic does not strength-reduce
    constant multiplies these chains are cheaper."""
    N0 = words & 0x0F0F0F0F
    N1 = (words >> 4) & 0x0F0F0F0F
    planes = []
    for N in (N0, N1):
        m = N & 0x01010101
        e2 = N & 0x06060606
        sg = N & 0x08080808
        e1 = e2 >> 1
        Rn = jnp.int32(np.int32(np.uint32(0x83838383))) - e1
        zb = ((e2 + 0x7E7E7E7E) >> 7) & 0x01010101
        zm = (zb << 8) - zb             # == zb * 0xFF
        Rs = (m << 7) - (m << 2) - m    # == m * 0x7B
        R = Rs ^ ((Rs ^ Rn) & zm)
        mb = m & zm
        planes.append((R, mb, sg))
    outs = []
    for p in range(4):
        R, mb, sg = planes[p & 1]
        if p < 2:
            out = ((R & 0x00FF00FF) << 7) \
                | ((mb & 0x00010001) << 6) \
                | ((sg & 0x00080008) << 12)
        else:
            out = (((R >> 8) & 0x00FF00FF) << 7) \
                | ((mb & 0x01000100) >> 2) \
                | ((sg & 0x08000800) << 4)
        outs.append(out)
    return outs


def fp4_planes_arith(words: jnp.ndarray, planes) -> dict:
    """The byte-SWAR FP4 decode of :func:`fp4_pair_patterns_all`
    restricted to a subset of the 4 plane outputs — only the nibble
    planes the subset touches (N0 for outputs 0/2, N1 for 1/3) pay the
    affine + subnormal-blend prep, so e.g. planes (1, 3) cost half the
    full decode's VPU work."""
    need = sorted({p & 1 for p in planes})
    prep = {}
    for par in need:
        N = ((words >> 4) & 0x0F0F0F0F) if par else (words & 0x0F0F0F0F)
        m = N & 0x01010101
        e2 = N & 0x06060606
        sg = N & 0x08080808
        e1 = e2 >> 1
        Rn = jnp.int32(np.int32(np.uint32(0x83838383))) - e1
        zb = ((e2 + 0x7E7E7E7E) >> 7) & 0x01010101
        zm = zb * 0xFF
        Rs = m * 0x7B
        R = Rs ^ ((Rs ^ Rn) & zm)
        mb = m & zm
        prep[par] = (R, mb, sg)
    outs = {}
    for p in planes:
        R, mb, sg = prep[p & 1]
        if p < 2:
            outs[p] = (((R & 0x00FF00FF) << 7)
                       | ((mb & 0x00010001) << 6)
                       | ((sg & 0x00080008) << 12))
        else:
            outs[p] = ((((R >> 8) & 0x00FF00FF) << 7)
                       | ((mb & 0x01000100) >> 2)
                       | ((sg & 0x08000800) << 4))
    return outs


def fp4_pair_patterns_mix(words: jnp.ndarray, tbl128: jnp.ndarray,
                          gather_planes: tuple) -> list:
    """FP4 pair decode splitting the four plane outputs between the
    dynamic-gather unit (``gather_planes``, reading the RAW pattern
    table — codebook x 12, all bf16-exact) and the byte-SWAR arithmetic
    (:func:`fp4_planes_arith` for the rest). The two lowerings occupy
    different issue resources, so when the kernel is VPU-bound the
    gather planes come (partly) for free — the same mechanism that won
    NF4 (``pair_patterns_mix``). Bit-identical to
    ``fp4_pair_patterns_all`` (tested). Raced on chip in
    benchmarks/manual_split_probe.py; gather planes (0, 2) leave only
    the odd-nibble plane N1 on the arithmetic side."""
    from .gemv import _take16_chunked

    outs = fp4_planes_arith(
        words, [p for p in range(4) if p not in gather_planes])
    for p in gather_planes:
        lo = (words >> (4 * p)) & 15
        hi = (words >> (16 + 4 * p)) & 15
        outs[p] = (_take16_chunked(tbl128, lo)
                   | (_take16_chunked(tbl128, hi) << 16))
    return [outs[p] for p in range(4)]


def pair_patterns_tree(words: jnp.ndarray, shift: int,
                       table: Sequence[float]) -> jnp.ndarray:
    """SWAR decode of TWO codes per int32 lane for an ARBITRARY 16-entry
    codebook (the NF4 path): a 4-level XOR-select tree over the bf16 bit
    patterns of the table, evaluated on both 16-bit halves at once.

    Per level the select is ``A ^ ((A ^ B) & mask)`` with per-half masks
    expanded from code bits via ``(mb << 16) - mb`` — XOR blending never
    carries across halves, so arbitrary (signed) patterns are safe.
    ~55 ops per 2 codes vs ~30 gather op-equivalents per 1 code for the
    in-kernel dynamic gather."""
    import ml_dtypes

    pat = np.asarray(np.asarray(table, np.float32).astype(ml_dtypes.bfloat16)
                     ).view(np.uint16).astype(np.uint64)
    both = [int(p | (p << np.uint64(16))) for p in pat]  # per-half const

    def c32(v):  # uint32 bit pattern -> int32 jnp constant
        return jnp.int32(np.uint32(v & 0xFFFFFFFF).astype(np.int32))

    pair = (words >> shift) & 0x000F000F
    masks = []
    for b in range(4):
        mb = (pair >> b) & 0x00010001
        masks.append((mb << 16) - mb)                 # full-half masks

    lvl = []
    for i in range(8):
        A, B = both[2 * i], both[2 * i + 1]
        lvl.append(c32(A) ^ (c32(A ^ B) & masks[0]))
    for b in range(1, 4):
        lvl = [lvl[2 * i] ^ ((lvl[2 * i] ^ lvl[2 * i + 1]) & masks[b])
               for i in range(len(lvl) // 2)]
    return lvl[0]


def _byte_tree4(N, consts, masks, m01, m23):
    """Radix-4 xor-mux over BYTE fields: ``N`` holds one 4-bit code per
    byte, ``consts`` 16 byte values; returns the selected byte per
    field (4 codes resolved per vector op). Two radix-4 levels instead
    of four radix-2 ones: each level folds two code bits with three
    masked xors (the ``A^B^C^D`` term uses the precomputed two-bit
    AND masks ``m01``/``m23``)."""
    def b4(v):  # byte constant replicated into all 4 byte fields
        v &= 0xFF
        return jnp.int32(np.uint32(
            v | (v << 8) | (v << 16) | (v << 24)).astype(np.int32))

    lvl = []
    for g in range(4):
        A, B, C, D = consts[4 * g:4 * g + 4]
        v = (b4(A)
             ^ (b4(A ^ B) & masks[0])
             ^ (b4(A ^ C) & masks[1])
             ^ (b4(A ^ B ^ C ^ D) & m01))
        lvl.append(v)
    L0, L1, L2, L3 = lvl
    return (L0 ^ ((L0 ^ L1) & masks[2]) ^ ((L0 ^ L2) & masks[3])
            ^ ((L0 ^ L1 ^ L2 ^ L3) & m23))


def pair_patterns_byte_pair(words: jnp.ndarray, table: Sequence[float],
                            odd: bool) -> tuple:
    """Decode the TWO pair-layout planes living in one nibble
    plane-pair — ``odd=False``: planes (0, 2) from the even nibbles
    ``words & 0x0F0F0F0F``; ``odd=True``: planes (1, 3) — via hi/lo
    byte-field radix-4 xor-mux trees (:func:`_byte_tree4`: 4 codes per
    vector op, the level masks shared between the two byte planes).
    Returns the two int32 packed-bf16-pattern outputs in plane order;
    bit-identical to :func:`pair_patterns_tree` on those planes.

    Cost for the two planes: ~14 mask ops + 2x30 tree ops + 8 assembly
    ops ≈ 82, vs 2x55 = 110 for two radix-2 half-word trees — the VPU
    side of the gather+tree mix decode (ops/qmatmul.pair_patterns_mix)
    at ~25% fewer ops."""
    import ml_dtypes

    pat = np.asarray(np.asarray(table, np.float32).astype(
        ml_dtypes.bfloat16)).view(np.uint16).astype(np.int64)
    his = [int(p) >> 8 for p in pat]
    los = [int(p) & 0xFF for p in pat]

    N = (words >> 4) & 0x0F0F0F0F if odd else words & 0x0F0F0F0F
    masks = []
    for b in range(4):
        mb = (N >> b) & 0x01010101
        masks.append((mb << 8) - mb)          # 0xFF per byte iff bit set
    m01 = masks[0] & masks[1]
    m23 = masks[2] & masks[3]
    hi = _byte_tree4(N, his, masks, m01, m23)
    lo = _byte_tree4(N, los, masks, m01, m23)
    mhi = jnp.int32(np.uint32(0xFF00FF00).astype(np.int32))
    # first plane of the pair: codes in bytes 0 (even row) / 2 (odd row)
    p_a = ((hi & 0x00FF00FF) << 8) | (lo & 0x00FF00FF)
    # second plane: bytes 1 / 3
    p_b = (hi & mhi) | ((lo >> 8) & 0x00FF00FF)
    return p_a, p_b


# Round-4 REFUTED: 16-bit-native decode variants (sort_fp4_words,
# fp4_pair_patterns_i16, pair_patterns_tree_i16) were removed after the
# on-chip rate table (benchmarks/pair_decode_probe3.py rates, chain
# r4a) showed Mosaic v5e does not lower int16 shifts AT ALL (remote
# compile HTTP 500) and int16 selects run SLOWER than int32 (138 vs
# 121 ns/op): sub-32-bit elementwise lanes are not packed, so the
# hoped-for 2x decode-rate win cannot exist on this generation. The
# magnitude-sort permutation insight (sorted FP4 patterns are affine:
# 0x3F80 + t<<6 for t >= 2) survives here for future hardware.


def lut_take(codes: jnp.ndarray, table: Sequence[float]) -> jnp.ndarray:
    """Direct gather — lets the compiler pick the lowering. Works under
    XLA everywhere; in Mosaic kernels support depends on the backend
    (raced in the bakeoff; may fail to lower on some generations)."""
    tbl = jnp.asarray(np.asarray(table, dtype=np.float32))
    return jnp.take(tbl, codes, axis=0)


_LUTS = {"tree": lut_tree, "fp4_bits": lut_fp4_bits, "take": lut_take}
LUT_NAMES = tuple(_LUTS)


def make_lut(name: str, table: Sequence[float]):
    """Bind a strategy name + table into a ``codes -> values`` function."""
    fn = _LUTS[name]
    table = tuple(float(v) for v in table)
    if name == "fp4_bits":
        # Only valid for the FP4 table.
        from ..quant.codebooks import FP4_CODE

        if not np.allclose(table, FP4_CODE, rtol=0, atol=0):
            raise ValueError("lut 'fp4_bits' is only exact for the FP4 codebook")
    return lambda codes: fn(codes, table)
