"""Linear4bit — the module layer.

TPU-native equivalent of the reference's module layer (modules.py:67-151
``Linear4bit`` + core.py:91-190 ``Params4bit``), redesigned as immutable
pytrees:

- ``Params4bit`` holds the packed weight in the TPU runtime layout
  (int32 words, a pure bitcast of the bnb byte layout) together with
  *pre-resolved* fp32 scales — the double-quant decode happens once at
  quantize/load time, not per forward call (the reference re-decoded the
  nested absmax on every decode GEMV, core.py:467).
- ``Linear4bit`` mirrors the bnb constructor surface
  (modules.py:86-96): in/out features, bias, compute_dtype,
  compress_statistics, quant_type — and honors ``compress_statistics``
  (the reference accepted but ignored it, modules.py:80).
- Forward dispatch mirrors modules.py:28-64: a single decode-shaped
  token row goes through the fused dequant+GEMV Pallas kernel; larger
  inputs take the dequant + MXU matmul path. On non-TPU backends both
  fall back to pure-XLA implementations so the same code runs in CPU
  tests and under ``shard_map`` dry-runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..quant.codebooks import get_4bit_code
from ..quant.functional import (
    dequantize_absmax,
    quantize_4bit,
)
from ..quant.state import QuantState
from ..ops.gemv import gemv_4bit_pallas, pack_i32_rows
from ..ops.lut import make_lut

__all__ = ["Params4bit", "Linear4bit", "apply_4bit", "GEMV_MAX_TOKENS"]

# Decode dispatch threshold: at most this many token rows go through the
# fused GEMV kernel (the reference's test is exactly one vector,
# modules.py:56). Small decode batches profit enormously from the fused
# path — weights are read and decoded ONCE per step regardless of batch,
# so aggregate throughput scales until the per-batch fma work rivals the
# decode work (~8 rows on v5e).
GEMV_MAX_TOKENS = 8

# Above the GEMV band, the fused dequant+matmul Pallas kernel
# (ops/qmatmul.py) wins until the XLA dequant-to-HBM + big-MXU-dot path
# amortizes its weight materialization (measured crossover ~64 rows on
# v5e: T=16 fused 251us vs XLA 349us; T=128 fused 426us vs XLA 348us).
QMATMUL_MAX_TOKENS = 64

# The SWAR pair kernel holds on longer before the dense pair matmul
# takes over (measured at [14336,4096]: T=256 fused 404us vs dense
# 433us; T=512: 782 vs 625). NOTE: that race was KERNEL-level only —
# the r5 prefill trace decomposition showed the dense path's e2e cost
# also includes the dequant materialization (loop fusions writing
# 235 MB/layer bf16 planes, 35.4% of device time) and stacked-word
# slice copies (16.0%) that the kernel comparison never counted, so
# the e2e crossover sits much higher than 256. QT_PAIR_MAX_TOKENS
# overrides for the e2e race (chain_r5i).
PAIR_QMATMUL_MAX_TOKENS = int(os.environ.get("QT_PAIR_MAX_TOKENS", "256"))

_SHIFTS = tuple(8 * (j // 2) + (4 - 4 * (j % 2)) for j in range(8))


def dequantize_permuted(
    wp: jnp.ndarray, scales: jnp.ndarray, quant_type: str,
    dtype: Any = jnp.bfloat16, lut: Optional[str] = None,
) -> jnp.ndarray:
    """Dequantize packed words to a column-permuted weight ``[M, K]``
    where column ``j*K/8 + c`` holds original element ``k = 8c + j``.

    The permutation avoids any nibble interleave (TPU layouts punish
    size-2 minor axes); matmul callers permute the activation columns
    with :func:`permute_cols` instead, which is O(K) per row.
    """
    if lut is None:
        lut = "fp4_bits" if quant_type == "fp4" else "tree"
    lut_fn = make_lut(lut, get_4bit_code(quant_type))
    # Scale per plane before the concat: keeps the fp32 transient at
    # [M, K/8] instead of materializing a full [M, K] fp32 scale array
    # (2 GB for a 128k-vocab lm_head).
    srep8 = jnp.repeat(scales, 8, axis=1)  # [M, K/8] fp32
    planes = [
        (lut_fn((wp >> s) & 15) * srep8).astype(dtype) for s in _SHIFTS
    ]
    return jnp.concatenate(planes, axis=1)  # [M, K] permuted


def permute_cols(x: jnp.ndarray) -> jnp.ndarray:
    """Permute activation columns to match :func:`dequantize_permuted`:
    ``[..., K] -> [..., K]`` with out[..., j*K/8 + c] = x[..., 8c + j]."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    return (
        x.reshape(*lead, K // 8, 8).swapaxes(-1, -2).reshape(*lead, K)
    )


def dense_weight(wp: jnp.ndarray, scales: jnp.ndarray, quant_type: str,
                 layout: str) -> jnp.ndarray:
    """Packed weight (pair or planar) + resolved scales -> the dense
    bf16 matrix ``[M, K]`` in ORIGINAL column order — the exact values
    the 4-bit model encodes (the "dequantized twin" weight). Used by
    ``evals/parity`` and the in-jit dense-twin mode
    (``QuantConfig.dense_twin``); a materialized 8B twin is 16.1 GB, so
    callers dequantize per layer and let the result be transient."""
    if layout == "pair":
        from ..ops.qmatmul import pair_to_planar

        wp = pair_to_planar(wp)
    if scales.dtype == jnp.int32:
        from ..ops.qmatmul import unpack_scale_pairs

        scales = unpack_scale_pairs(scales)
    Wp = dequantize_permuted(wp, scales, quant_type, dtype=jnp.bfloat16)
    M, K = Wp.shape
    # invert the plane permutation: permuted col j*K/8 + c -> original 8c+j
    return Wp.reshape(M, 8, K // 8).swapaxes(1, 2).reshape(M, K)


def dense_matmul_pair(
    x2: jnp.ndarray,
    wp2: jnp.ndarray,
    scales: jnp.ndarray,
    quant_type: str,
    compute_dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """Prefill matmul DIRECTLY from the pair layout: dequantize the
    even-row and odd-row 16-bit halves as two ``[M/2, K]`` matrices in
    the pair column order (matched by ``pair_permute_activation``), dot
    each, and interleave the OUTPUT columns — all full-lane ops. An
    in-jit ``pair_to_planar`` + planar dequant costs ~1.1 ms extra per
    call at [14336,4096] (the row re-interleave's size-2 sublane axis);
    this path matches the planar XLA prefill throughput instead."""
    from ..ops.qmatmul import pair_permute_activation

    M2, K4 = wp2.shape[-2:]
    T = x2.shape[0]
    NB = scales.shape[-1]
    lut = "fp4_bits" if quant_type == "fp4" else "tree"
    lut_fn = make_lut(lut, get_4bit_code(quant_type))
    xf = pair_permute_activation(x2.astype(compute_dtype)).reshape(
        T, 4 * K4)
    rep = K4 // NB
    ys = []
    for rows, base in ((slice(0, None, 2), 0), (slice(1, None, 2), 16)):
        srep = jnp.tile(scales[rows, :].astype(jnp.float32), (1, rep))
        planes = [
            (lut_fn((wp2 >> (base + 4 * p)) & 15) * srep
             ).astype(compute_dtype) for p in range(4)
        ]
        Wh = jnp.concatenate(planes, axis=1)          # [M/2, K] pair cols
        ys.append(jnp.dot(xf, Wh.T, preferred_element_type=jnp.float32))
    return jnp.stack(ys, axis=-1).reshape(T, 2 * M2)


def apply_4bit(
    x2: jnp.ndarray,
    wp: jnp.ndarray,
    scales: jnp.ndarray,
    quant_type: str,
    compute_dtype: Any = jnp.bfloat16,
    use_pallas: bool = True,
    axis_name: Optional[str] = None,
    pair_pipeline: str = "grid",
    fp4_decode: str = "arith",
) -> jnp.ndarray:
    """Core 4-bit matmul dispatch shared by :class:`Linear4bit` and the
    model layer: ``x2 [T, K] @ dequant(wp, scales).T -> [T, M]`` fp32.

    Decode-shaped inputs (few token rows) take the fused dequant+GEMV
    Pallas kernel; everything else dequantizes to ``compute_dtype`` and
    uses the MXU (reference modules.py:28-64 dispatch). ``axis_name`` set
    means we are inside ``shard_map`` — Pallas stays enabled (per-shard
    shapes are static) but the caller is responsible for the reduction.
    """
    tokens = x2.shape[0]
    on_tpu = use_pallas and jax.default_backend() == "tpu"
    spacked = scales.dtype == jnp.int32          # bf16x2 packed pairs
    pair = spacked or wp.shape[-2] != scales.shape[-2]
    if pair and on_tpu:
        # fused pair kernel up to its measured crossover vs the dense
        # pair matmul, then dequant straight from the pair layout
        from ..ops.qmatmul import pair_tokens_ok

        if tokens <= PAIR_QMATMUL_MAX_TOKENS and pair_tokens_ok(tokens):
            from ..ops.qmatmul import manual_vmem_ok

            # bf16x2 packed scales hold two rows per int32 word: 2
            # effective bytes per logical row in the VMEM budget.
            # Packed + manual at tokens>=4 OOMs Mosaic's scoped stack
            # on chip (chain_r5e: [4096,4096] T=4 manual_stacked dies
            # where the estimate passes) — and grid ties manual at
            # decode shapes anyway, so packed scales stay on grid.
            s_item = 2 if spacked else scales.dtype.itemsize
            if (pair_pipeline == "manual" and not spacked
                    and (2 * wp.shape[-2]) % 128 == 0
                    and manual_vmem_ok(2 * wp.shape[-2], 4 * wp.shape[-1],
                                       tokens, s_item)):
                from ..ops.qmatmul import matmul_4bit_pair_manual

                return matmul_4bit_pair_manual(
                    wp, scales, x2.astype(compute_dtype),
                    quant_type=quant_type, decode=fp4_decode)
            from ..ops.qmatmul import matmul_4bit_pair_pallas

            return matmul_4bit_pair_pallas(
                wp, scales, x2.astype(compute_dtype),
                quant_type=quant_type, decode=fp4_decode)
        if spacked:
            from ..ops.qmatmul import unpack_scale_pairs

            scales = unpack_scale_pairs(scales)
        return dense_matmul_pair(x2, wp, scales, quant_type,
                                 compute_dtype=compute_dtype)
    if pair:
        # CPU/XLA fallback: recover the planar words so the pair layout
        # is numerically indistinguishable from planar in tests
        from ..ops.qmatmul import pair_to_planar

        wp = pair_to_planar(wp)
        if spacked:
            from ..ops.qmatmul import unpack_scale_pairs

            scales = unpack_scale_pairs(scales)
    # the fused dequant+matmul kernel wins at EVERY small batch size on
    # v5e (B=1: 215us vs the VPU-fma GEMV's 235us at [14336,4096]; B=8:
    # 231 vs 633 — the MXU absorbs the per-row multiply-accumulate); the
    # GEMV remains for row counts its tiling can't express and as the
    # bit-faithful fp32 reference path.
    qmm_ok = tokens in (1, 2, 4) or tokens % 8 == 0
    if tokens <= QMATMUL_MAX_TOKENS and qmm_ok and on_tpu:
        from ..ops.qmatmul import matmul_4bit_pallas

        return matmul_4bit_pallas(
            wp, scales, x2.astype(compute_dtype), quant_type=quant_type,
        )
    if tokens <= GEMV_MAX_TOKENS and on_tpu:
        return gemv_4bit_pallas(
            wp, scales, x2.astype(compute_dtype), quant_type=quant_type,
        )
    W = dequantize_permuted(wp, scales, quant_type, dtype=compute_dtype)
    xp = permute_cols(x2.astype(compute_dtype))
    # fp32 compute_dtype means the caller wants fp32 numerics: force the
    # 3-pass MXU mode (default precision would round operands to bf16).
    prec = (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32 else None)
    return jnp.dot(xp, W.T, preferred_element_type=jnp.float32,
                   precision=prec)


@struct.dataclass
class Params4bit:
    """Quantized parameter: packed codes + resolved scales + QuantState.

    ``wp`` is the int32-word view of the bnb packed bytes (bitcast, same
    memory contents); ``scales`` are the per-64-block fp32 absmax with
    double quantization already inverted. ``quant_state`` retains the
    bnb-serializable form (uint8 nested absmax etc.).
    """

    wp: jnp.ndarray        # int32 [out_features, in_features // 8]
    scales: jnp.ndarray    # float32 [out_features, in_features // 64]
    quant_state: QuantState

    @property
    def shape(self):
        return self.quant_state.shape

    @property
    def layout(self) -> str:
        return ("planar" if self.wp.shape[-2] == self.scales.shape[-2]
                else "pair")

    @classmethod
    def quantize(
        cls,
        W: jnp.ndarray,
        blocksize: int = 64,
        quant_type: str = "fp4",
        compress_statistics: bool = True,
        layout: str = "planar",
    ) -> "Params4bit":
        """Quantize a ``[out, in]`` weight (the reference quantizes on
        device placement, core.py:139-161; here it is an explicit pure
        function, jittable and shardable). ``layout="pair"`` stores the
        SWAR row-pair words for the fastest FP4 decode kernel (the
        model runtime's default; the module layer defaults to planar,
        the bit-faithful bnb byte order)."""
        out_f, in_f = W.shape
        if in_f % max(blocksize, 8):
            raise ValueError(
                f"in_features={in_f} must be a multiple of blocksize "
                f"{blocksize} for the packed TPU layout"
            )
        packed, state = quantize_4bit(
            W, blocksize=blocksize, quant_type=quant_type,
            compress_statistics=compress_statistics,
        )
        wp = pack_i32_rows(packed, out_f, in_f)
        scales = dequantize_absmax(state).reshape(out_f, in_f // blocksize)
        if blocksize != 64:
            # The GEMV kernel assumes 64-element blocks; expand other
            # block sizes to the per-64 granularity it expects.
            rep = blocksize // 64
            scales = jnp.repeat(scales, rep, axis=1)
        if layout == "pair":
            if out_f % 2:
                raise ValueError(
                    f"pair layout requires even out_features (got {out_f})")
            from ..ops.qmatmul import planar_to_pair

            wp = planar_to_pair(wp)
        return cls(wp=wp, scales=scales, quant_state=state)

    def packed_u8(self) -> jnp.ndarray:
        """bnb byte-layout view ``[(n+1)//2, 1]`` of the packed codes."""
        wp = self.wp
        if self.layout == "pair":
            from ..ops.qmatmul import pair_to_planar

            wp = pair_to_planar(wp)
        u8 = jax.lax.bitcast_convert_type(wp, jnp.uint8)
        return u8.reshape(-1, 1)


@struct.dataclass
class Linear4bit:
    """bnb-compatible 4-bit linear layer (reference modules.py:67-151).

    Construct with :meth:`create` (quantizes a full-precision weight) or
    assemble directly from loaded checkpoint parts. Callable on inputs of
    shape ``[..., in_features]``.
    """

    weight: Params4bit
    bias: Optional[jnp.ndarray] = None
    compute_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    pair_pipeline: str = struct.field(pytree_node=False, default="grid")
    fp4_decode: str = struct.field(pytree_node=False, default="arith")

    @property
    def in_features(self) -> int:
        return self.weight.shape[1]

    @property
    def out_features(self) -> int:
        return self.weight.shape[0]

    @property
    def quant_state(self) -> QuantState:
        return self.weight.quant_state

    @classmethod
    def create(
        cls,
        W: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        compute_dtype: Any = jnp.bfloat16,
        compress_statistics: bool = True,
        quant_type: str = "fp4",
        blocksize: int = 64,
        use_pallas: bool = True,
        layout: str = "planar",
    ) -> "Linear4bit":
        params = Params4bit.quantize(
            W, blocksize=blocksize, quant_type=quant_type,
            compress_statistics=compress_statistics, layout=layout,
        )
        return cls(weight=params, bias=bias, compute_dtype=compute_dtype,
                   use_pallas=use_pallas)

    # -- forward ----------------------------------------------------------

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward: decode-shaped inputs take the fused GEMV kernel,
        everything else dequant + MXU matmul (reference modules.py:28-64
        dispatch). Input is cast to ``compute_dtype`` and the output cast
        back to the input dtype (modules.py:136-149)."""
        in_dtype = x.dtype
        lead = x.shape[:-1]
        K = x.shape[-1]
        tokens = int(np.prod(lead)) if lead else 1
        x2 = x.reshape(tokens, K)
        out = apply_4bit(
            x2, self.weight.wp, self.weight.scales,
            self.quant_state.quant_type,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            pair_pipeline=self.pair_pipeline, fp4_decode=self.fp4_decode,
        )
        if self.bias is not None:
            out = out + self.bias.astype(out.dtype)
        return out.reshape(*lead, self.out_features).astype(in_dtype)
