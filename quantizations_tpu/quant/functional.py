"""Functional quantization core — pure JAX/XLA, CPU-runnable.

TPU-native re-implementation of the reference's functional layer
(core.py:317-634). These are the *semantic reference* implementations:
vectorized XLA code that reproduces the reference CUDA kernels'
quantization decisions bit-for-bit (code assignment, nibble packing,
double-quant statistics). The Pallas kernels in
``quantizations_tpu.ops`` are the performance path and are tested
against these.

Key semantics preserved from the reference:
- FP4 code assignment uses the literal threshold constants of
  ``dQuantizeFP4`` (kernels.cu:113-163), ties resolving toward the
  smaller-magnitude code (strict ``>``).
- NF4 uses nearest-entry with fp32 midpoints (== bitsandbytes
  ``dQuantizeNF4``; the sorted NF4 table is reference kernels.cu:851).
- 8-bit codebook quantization is nearest-entry with midpoint rounding,
  equivalent to the binary search of ``dQuantize`` (kernels.cu:166-256).
- Nibble packing: high nibble = even element, low nibble = odd element
  (kernels.cu:463-471).
- Double quantization of absmax: subtract the mean ("offset"), 8-bit
  quantize with blocksize 256 against the dynamic map
  (core.py:563-576).
- A zero block (absmax == 0) quantizes to code 0 and dequantizes to 0
  (the reference reaches the same values through a NaN path; we use a
  guarded reciprocal instead).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .codebooks import (
    FP4_CODE,
    NF4_CODE,
    code_midpoints,
    create_dynamic_map,
    get_4bit_code,
)
from .state import QuantState

__all__ = [
    "quantize_fp4_codes",
    "quantize_nf4_codes",
    "quantize_codebook_codes",
    "quantize_blockwise",
    "dequantize_blockwise",
    "quantize_4bit",
    "dequantize_4bit",
    "dequantize_absmax",
    "pack_4bit",
    "unpack_4bit",
    "gemv_4bit",
    "matmul_4bit",
]


# --------------------------------------------------------------------------
# Code assignment (value -> 4/8-bit code), vectorized
# --------------------------------------------------------------------------

def quantize_fp4_codes(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized values in [-1, 1] -> FP4 codes (uint8, 0..15).

    Branchless port of the ``dQuantizeFP4`` decision tree
    (kernels.cu:113-163) with its literal fp32 threshold constants.
    """
    sign = jnp.where(x < 0, jnp.uint8(0b1000), jnp.uint8(0))
    a = jnp.abs(x)
    c = jnp.where(
        a > 0.29166667,
        jnp.where(
            a > 0.583333,
            jnp.where(a > 0.8333333, jnp.uint8(0b0011), jnp.uint8(0b0010)),
            jnp.where(a > 0.4166667, jnp.uint8(0b0101), jnp.uint8(0b0100)),
        ),
        jnp.where(
            a > 0.0859375,
            jnp.where(a > 0.20833333, jnp.uint8(0b0111), jnp.uint8(0b0110)),
            jnp.where(a > 0.00260417, jnp.uint8(0b0001), jnp.uint8(0b0000)),
        ),
    )
    return c + sign


_NF4_MIDPOINTS = code_midpoints(NF4_CODE)  # 15 fp32 midpoints


def quantize_nf4_codes(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized values -> NF4 codes (uint8, 0..15).

    NF4 is sorted ascending, so nearest-entry quantization is
    ``sum(x > midpoint_i)``; the fp32 midpoints equal the literal
    thresholds of bitsandbytes' ``dQuantizeNF4`` ladder. Ties at a
    midpoint round to the lower code (strict ``>``).
    """
    mids = jnp.asarray(_NF4_MIDPOINTS)
    return jnp.sum(
        x[..., None] > mids, axis=-1, dtype=jnp.int32
    ).astype(jnp.uint8)


def quantize_codebook_codes(x: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Normalized values -> codes against an arbitrary *sorted* codebook.

    Nearest-entry with fp32 midpoint rounding — semantics of ``dQuantize``
    (kernels.cu:166-256): strictly-greater comparison means ties go to
    the lower index. Used for the 256-entry dynamic map.
    """
    mids = (code[:-1] + code[1:]) * jnp.float32(0.5)
    # searchsorted(side='left') == count of (mid < x) == count of (x > mid),
    # including tie handling: ties at a midpoint round to the lower index.
    idx = jnp.searchsorted(mids, x.reshape(-1), side="left")
    return idx.reshape(x.shape).astype(jnp.uint8)


def quantize_codebook_codes_stochastic(
    x: jnp.ndarray, code: jnp.ndarray, key: jnp.ndarray
) -> jnp.ndarray:
    """Stochastic rounding against a sorted codebook: round to the upper
    bracketing entry with probability ``(x - lower) / (upper - lower)``
    — unbiased within the bracket (E[dequant] == x). Semantics of the
    reference's ``dQuantize<STOCHASTIC=1>`` template (kernels.cu:195-255;
    the reference ships the kernel but its Python layer never enables
    it — here it is a first-class option)."""
    flat = x.reshape(-1)
    hi = jnp.clip(jnp.searchsorted(code, flat, side="left"),
                  0, code.shape[0] - 1)
    lo = jnp.maximum(hi - 1, 0)
    cl = jnp.take(code, lo)
    ch = jnp.take(code, hi)
    denom = ch - cl
    frac = jnp.where(denom > 0, (flat - cl) / denom, 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)
    r = jax.random.uniform(key, flat.shape, jnp.float32)
    idx = jnp.where(r < frac, hi, lo)
    return idx.reshape(x.shape).astype(jnp.uint8)


_CODES_FN = {"fp4": quantize_fp4_codes, "nf4": quantize_nf4_codes}


# --------------------------------------------------------------------------
# Nibble packing — high nibble = even element (kernels.cu:463-471)
# --------------------------------------------------------------------------

def pack_4bit(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack flat uint8 codes (0..15), length 2n, into n bytes:
    ``byte[i] = codes[2i] << 4 | codes[2i+1]``.

    TPU note: pairing is done with stride-2 lane slices on a 2D
    lane-aligned view — a ``reshape(-1, 2)`` would be padded 64x by the
    TPU tiled layout and OOM on large weights.
    """
    flat = codes.reshape(-1)
    n = flat.shape[0]
    assert n % 2 == 0
    cols = 512 if n % 512 == 0 else 2
    c2 = flat.reshape(-1, cols)
    return (c2[:, 0::2] << 4 | c2[:, 1::2]).astype(jnp.uint8).reshape(-1)


def unpack_4bit(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_4bit`: n bytes -> 2n codes.

    The even/odd interleave is built by bitcasting a u16 lane array
    (little-endian: low byte first) instead of stacking along a size-2
    minor axis, for the same TPU tiled-layout reason as pack_4bit.
    """
    flat = packed.reshape(-1)
    n2 = flat.shape[0]
    cols = 256 if n2 % 256 == 0 else 1
    b2 = flat.reshape(-1, cols)
    hi = (b2 >> 4) & 0xF  # even elements
    lo = b2 & 0xF         # odd elements
    u16 = hi.astype(jnp.uint16) | (lo.astype(jnp.uint16) << 8)
    pairs = jax.lax.bitcast_convert_type(u16, jnp.uint8)  # [..., cols, 2]
    return pairs.reshape(-1)


# --------------------------------------------------------------------------
# 8-bit blockwise (statistics path) — reference core.py:317-423
# --------------------------------------------------------------------------

def _block_absmax(flat: jnp.ndarray, blocksize: int) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad flat fp32 values to a blocksize multiple and compute per-block
    absmax. Returns (blocked [nblocks, blocksize], absmax [nblocks], n)."""
    n = flat.shape[0]
    nblocks = -(-n // blocksize)
    pad = nblocks * blocksize - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocked = flat.reshape(nblocks, blocksize)
    absmax = jnp.max(jnp.abs(blocked), axis=1)
    return blocked, absmax, n


def quantize_blockwise(
    A: jnp.ndarray,
    code: Optional[jnp.ndarray] = None,
    blocksize: int = 256,
    stochastic: bool = False,
    key: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, QuantState]:
    """8-bit blockwise quantization against a 256-entry codebook.

    Reference core.py:317-366 (kernel kernels.cu:340-478, General8bit
    path). Returns (uint8 codes with A's shape, QuantState).
    ``stochastic=True`` (with a PRNG ``key``) rounds stochastically —
    unbiased, for accumulating statistics (the reference's unused
    STOCHASTIC kernel template, kernels.cu:239-255).
    """
    if code is None:
        code = jnp.asarray(create_dynamic_map())
    code = jnp.asarray(code, jnp.float32)
    flat = A.reshape(-1).astype(jnp.float32)
    blocked, absmax, n = _block_absmax(flat, blocksize)
    inv = jnp.where(absmax > 0, 1.0 / absmax, 0.0)
    norm = blocked * inv[:, None]
    if stochastic:
        if key is None:
            raise ValueError("stochastic quantization needs a PRNG key")
        q = quantize_codebook_codes_stochastic(norm, code, key)
    else:
        q = quantize_codebook_codes(norm, code)
    q = q.reshape(-1)[:n].reshape(A.shape)
    state = QuantState(
        absmax=absmax,
        code=code,
        blocksize=blocksize,
        quant_type="dynamic8bit",
        dtype=A.dtype,
        shape=tuple(A.shape),
    )
    return q, state


def dequantize_blockwise(q: jnp.ndarray, state: QuantState) -> jnp.ndarray:
    """Inverse of :func:`quantize_blockwise` — codebook gather × absmax
    (reference core.py:369-423; kernel kernels.cu:549-552)."""
    flat = q.reshape(-1)
    n = flat.shape[0]
    nblocks = state.absmax.shape[0]
    pad = nblocks * state.blocksize - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    vals = jnp.take(state.code, flat.astype(jnp.int32))
    vals = vals.reshape(nblocks, state.blocksize) * state.absmax[:, None]
    return vals.reshape(-1)[:n].reshape(state.shape).astype(state.dtype)


# --------------------------------------------------------------------------
# 4-bit blockwise (weights path) — reference core.py:507-634
# --------------------------------------------------------------------------

def quantize_4bit(
    A: jnp.ndarray,
    blocksize: int = 64,
    quant_type: str = "fp4",
    compress_statistics: bool = True,
) -> Tuple[jnp.ndarray, QuantState]:
    """Blockwise 4-bit quantization of a weight tensor.

    Reference core.py:507-578, with two deliberate fixes documented in
    SURVEY.md: ``compress_statistics`` is honored (the reference always
    double-quantizes, modules.py:80), and NF4 is supported alongside FP4.

    Returns (packed uint8 ``[ceil(n/2), 1]`` — bnb shape convention,
    core.py:545-546 — and the QuantState).
    """
    if quant_type not in _CODES_FN:
        raise NotImplementedError(f"quant_type {quant_type!r} not supported")
    flat = A.reshape(-1).astype(jnp.float32)
    blocked, absmax, n = _block_absmax(flat, blocksize)
    inv = jnp.where(absmax > 0, 1.0 / absmax, 0.0)
    norm = blocked * inv[:, None]
    codes = _CODES_FN[quant_type](norm).reshape(-1)
    # Pad to even count before packing (bnb packs ceil(n/2) bytes).
    if codes.shape[0] % 2:
        codes = jnp.pad(codes, (0, 1))
    packed = pack_4bit(codes)[: (n + 1) // 2].reshape(-1, 1)

    code = jnp.asarray(get_4bit_code(quant_type))
    if compress_statistics:
        # Double-quantize the absmax statistics: reference core.py:563-576.
        offset = jnp.mean(absmax)
        qabsmax, state2 = quantize_blockwise(absmax - offset, blocksize=256)
        state = QuantState(
            absmax=qabsmax,
            code=code,
            offset=offset,
            state2=state2,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=A.dtype,
            shape=tuple(A.shape),
        )
    else:
        state = QuantState(
            absmax=absmax,
            code=code,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=A.dtype,
            shape=tuple(A.shape),
        )
    return packed, state


def dequantize_absmax(state: QuantState) -> jnp.ndarray:
    """Resolve the per-block fp32 scales, inverting double quantization if
    present (reference core.py:613-617 / the per-call dequant at
    core.py:467-468 — here it is a separate function precisely so callers
    can hoist it out of the decode loop)."""
    if state.nested:
        absmax = dequantize_blockwise(state.absmax, state.state2)
        return (absmax + state.offset).astype(jnp.float32)
    return state.absmax.astype(jnp.float32)


def dequantize_4bit(
    packed: jnp.ndarray,
    state: QuantState,
    dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Unpack + dequantize a 4-bit tensor to ``state.shape``.

    Reference core.py:581-634 — but returns the tensor in its natural
    orientation (the reference returns ``out.t()`` and makes callers
    compensate, core.py:634 / modules.py:64; we do not copy that quirk).
    """
    absmax = dequantize_absmax(state)
    codes = unpack_4bit(packed.reshape(-1))
    n = int(np.prod(state.shape))
    codes = codes[:n]
    nblocks = absmax.shape[0]
    pad = nblocks * state.blocksize - n
    if pad:
        codes = jnp.pad(codes, (0, pad))
    vals = jnp.take(state.code, codes.astype(jnp.int32))
    vals = vals.reshape(nblocks, state.blocksize) * absmax[:, None]
    out = vals.reshape(-1)[:n].reshape(state.shape)
    return out.astype(dtype or state.dtype)


# --------------------------------------------------------------------------
# Matmul / GEMV (XLA fallback path; the Pallas fused kernel lives in ops/)
# --------------------------------------------------------------------------

def gemv_4bit(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    state: QuantState,
    absmax_f32: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batch-1 decode matvec ``x @ W^T`` with W stored 4-bit.

    XLA fallback for reference core.py:426-504. ``absmax_f32`` lets the
    caller pass pre-decoded scales (fixing the per-call nested-absmax
    dequant the reference does at core.py:467).
    """
    if absmax_f32 is None:
        absmax_f32 = dequantize_absmax(state)
    W = _dequant_with_scales(packed, state, absmax_f32)
    return jnp.dot(
        x.astype(jnp.float32),
        W.T,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _dequant_with_scales(
    packed: jnp.ndarray, state: QuantState, absmax_f32: jnp.ndarray
) -> jnp.ndarray:
    codes = unpack_4bit(packed.reshape(-1))
    n = int(np.prod(state.shape))
    vals = jnp.take(state.code, codes[:n].astype(jnp.int32))
    nblocks = absmax_f32.shape[0]
    vals = vals.reshape(nblocks, state.blocksize) * absmax_f32[:, None]
    return vals.reshape(state.shape)


def matmul_4bit(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    state: QuantState,
    bias: Optional[jnp.ndarray] = None,
    absmax_f32: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x @ W^T (+ bias)`` with 4-bit W — XLA path.

    Unlike the reference's two-branch dispatch (modules.py:28-64), under
    XLA both prefill and decode share one code path: dequantize (fused by
    XLA into the matmul epilogue where profitable) + MXU matmul. The
    Pallas fused-GEMV decode path is selected at the module layer.
    """
    if absmax_f32 is None:
        absmax_f32 = dequantize_absmax(state)
    W = _dequant_with_scales(packed, state, absmax_f32)
    out = jnp.dot(
        x.astype(state.dtype),
        W.astype(state.dtype).T,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
