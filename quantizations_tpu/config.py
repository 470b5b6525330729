"""Single-source-of-truth configuration dataclasses.

The reference hardcodes its constants in several places (blocksize 64 at
core.py:102, double-quant blocksize 256 at core.py:565, the allowed
blocksize list duplicated at core.py:350/408/549/603). Here every knob
lives in one validated dataclass (SURVEY.md §5, config subsystem).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp

__all__ = ["QuantConfig", "ServeConfig", "VALID_BLOCKSIZES"]

# Blocksizes the blockwise kernels accept (reference core.py:350).
VALID_BLOCKSIZES = (64, 128, 256, 512, 1024, 2048, 4096)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """How weights are quantized.

    Mirrors the knobs of ``quantize_4bit`` (reference core.py:507-578) and
    the ``Linear4bit`` constructor (reference modules.py:86-96), with
    ``compress_statistics`` actually honored.
    """

    quant_type: str = "fp4"            # "fp4" | "nf4"
    blocksize: int = 64
    compress_statistics: bool = True   # double-quant the absmax
    stats_blocksize: int = 256         # nested 8-bit blocksize (core.py:565)
    compute_dtype: Any = jnp.bfloat16
    quantize_lm_head: bool = True      # bnb leaves lm_head dense; 4-bit it
                                       # (decode is HBM-bound; the dense
                                       # head would be ~20% of bytes/token)
    # 4-bit the embedding table too (bnb keeps it dense; the TPU gather
    # from packed rows + per-row dequant is cheap). Off by default for
    # strict bnb parity; with scales_dtype=bfloat16 this brings the
    # total weight footprint to ~25% of bf16.
    quantize_embedding: bool = False
    # dtype of the RESOLVED per-block scales held in HBM. fp32 is
    # bit-faithful to bnb's decoded statistics; bfloat16 halves the
    # scale footprint (scales are ~11% of weight bytes) and is
    # numerically identical on the MXU decode path (which rounds scales
    # to bf16 in-kernel) — but measured ~10% SLOWER end-to-end on v5e
    # (standalone kernel time is flat; the regression is XLA-level in
    # the full decode program), so it stays a footprint knob, off by
    # default. "bf16x2" (round 4) stores MERGED bf16 row-pair words
    # (int32 [out/2, in/64] — the pair kernels' own in-kernel form,
    # ops/qmatmul.pack_scale_pairs): same bytes as bfloat16, zero
    # per-step transform, and the array dtype stays int32 (pair layout
    # only; serving-time — TP/PP factories and the bnb exporter
    # consume the float form).
    scales_dtype: Any = jnp.float32
    # decode-band pair-kernel weight streaming: "grid" = Pallas
    # grid-pipelined kernel; "manual" = explicit double-buffered DMA
    # pipeline (ops/qmatmul.py manual variants — steady-state
    # max(DMA, compute) instead of their measured sum). Numerics are
    # identical; selection is a perf knob until the on-chip probe
    # (benchmarks/pair_dma_pipeline_probe.py) settles the default.
    pair_pipeline: str = "grid"
    # FP4 pair-kernel decode strategy: "arith" = byte-SWAR all-planes
    # bit arithmetic; "mixg0"/"mixg02" route 1/2 of the 4 plane outputs
    # through the dynamic-gather unit (RAW pattern table) while the
    # remaining planes keep the arithmetic decode restricted to the
    # nibble planes they need. The decode kernel is VPU-bound (manual
    # DMA pipeline ties the grid kernel, round-3 probe), so gather
    # planes overlap the ALU work. Raced on chip in
    # benchmarks/manual_split_probe.py; bit-identical either way.
    # Round 4 REFUTED 16-bit-native decode ("s16"/"tree16", removed):
    # Mosaic does not lower int16 shifts at all and int16 selects run
    # SLOWER than int32 (138 vs 121 ns/op chain rate) — sub-32-bit
    # lanes are not packed (benchmarks/pair_decode_probe3.py rates,
    # chain_r4a).
    fp4_decode: str = "arith"
    # NF4 pair-kernel decode strategy: "mix" = gather planes 0,1 + two
    # radix-2 half-word xor trees (the round-2 winner); "mix_bt" routes
    # planes 0,2 through the gather unit and resolves planes 1,3 with
    # ONE odd-nibble radix-4 BYTE tree (~25% fewer tree-side VPU ops;
    # ops/qmatmul.pair_patterns_mix_bt); "mix_g3" = 3 gather planes +
    # 1 tree plane (rebalances toward the gather unit). Bit-identical;
    # raced on chip (mix_bt LOST: kernel 246us vs 199, e2e 30.1 vs
    # 36.5 tok/s — the byte tree does not pipeline as well in situ).
    nf4_decode: str = "mix"
    # dense-twin mode (round 4, accuracy evals): every projection
    # dequantizes its layer to dense bf16 IN-JIT and runs an MXU
    # matmul — the model computes with the exact dequantized-twin
    # weights while HBM holds only the 4-bit params (a materialized 8B
    # twin is 16.1 GB and cannot fit a v5e; this one is transient per
    # layer). Same params object, same Engine, only this flag differs —
    # the controlled comparison for IFEval parity (evals --ifeval-proxy).
    dense_twin: bool = False

    @property
    def pair_decode(self) -> str:
        """The pair-kernel decode strategy for THIS quant type (what the
        ``decode=`` kernel argument expects)."""
        return self.fp4_decode if self.quant_type == "fp4" else self.nf4_decode

    def __post_init__(self):
        if self.quant_type not in ("fp4", "nf4"):
            raise ValueError(f"quant_type {self.quant_type!r} not supported")
        if self.pair_pipeline not in ("grid", "manual"):
            raise ValueError(
                f"pair_pipeline {self.pair_pipeline!r} not in "
                f"('grid', 'manual')")
        if self.fp4_decode not in ("arith", "arith_sr", "mixg0", "mixg02"):
            raise ValueError(
                f"fp4_decode {self.fp4_decode!r} not in "
                f"('arith', 'arith_sr', 'mixg0', 'mixg02')")
        if self.nf4_decode not in ("mix", "mix_bt", "mix_g3"):
            raise ValueError(
                f"nf4_decode {self.nf4_decode!r} not in "
                f"('mix', 'mix_bt', 'mix_g3')")
        if self.scales_dtype != "bf16x2":
            try:
                ok = jnp.dtype(self.scales_dtype) in (
                    jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
            except TypeError:
                ok = False
            if not ok:
                raise ValueError(
                    f"scales_dtype {self.scales_dtype!r} not in "
                    f"(float32, bfloat16, 'bf16x2')")
        if self.blocksize not in VALID_BLOCKSIZES:
            raise ValueError(
                f"blocksize {self.blocksize} not in {VALID_BLOCKSIZES}"
            )
        if self.stats_blocksize not in VALID_BLOCKSIZES:
            raise ValueError(
                f"stats_blocksize {self.stats_blocksize} not in "
                f"{VALID_BLOCKSIZES}"
            )


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Serving/runtime knobs: mesh shape, batching, generation limits."""

    mesh_shape: Tuple[int, ...] = (1,)       # (tp,) or (dp, tp)
    mesh_axes: Tuple[str, ...] = ("tp",)
    batch_size: int = 1
    max_seq_len: int = 2048
    max_new_tokens: int = 60                 # reference bench: 60 tokens
    temperature: float = 0.0                 # 0 => greedy
    top_k: int = 0                           # 0 => no top-k mask
    top_p: float = 1.0                       # 1.0 => no nucleus mask
    eos_id: Optional[int] = None             # freeze a row once it emits eos
    seed: int = 0
    donate_cache: bool = True

    @property
    def tp(self) -> int:
        return self.mesh_shape[self.mesh_axes.index("tp")] \
            if "tp" in self.mesh_axes else 1
