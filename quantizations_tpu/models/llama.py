"""Llama3 in pure JAX with 4-bit quantized projections.

The reference library never owns the model — it monkey-patches its
``Linear4bit`` into HF transformers (reference README.md:55-86) and rides
``model.generate()``. That costs it 448 kernel launches per decoded token
(SURVEY.md §3.2). Here the whole decode step is ONE jitted function: the
32 decoder layers run under a single ``lax.scan`` over stacked layer
parameters, each projection dispatching to the fused dequant+GEMV Pallas
kernel, and the KV cache is a donated carry updated in place.

Architecture (Llama3-8B-Instruct, the reference's only tested model,
reference README.md:10): RMSNorm, rotary embeddings (HF non-interleaved
convention), grouped-query attention, SwiGLU MLP.

Sharding: every forward function is written shard-agnostic — head counts
and row counts are derived from the (possibly per-shard) weight shapes,
and an optional ``axis_name`` triggers the tensor-parallel ``psum`` after
the row-parallel projections (o_proj, down_proj). The same code therefore
runs single-chip under ``jit`` and per-shard under ``shard_map``.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import QuantConfig
from ..nn.linear import apply_4bit

# round-5 experimental: route prefill-shaped projections through the
# decode-once pair kernel instead of the dense dequant-materialization
# path (QT_PREFILL_PAIR=1; raced on chip by chain_r5j)
_PREFILL_PAIR = int(os.environ.get("QT_PREFILL_PAIR", "0"))
from ..quant.functional import dequantize_absmax, quantize_4bit
from ..ops.gemv import gemv_4bit_pallas_stacked, pack_i32_rows

__all__ = [
    "LlamaConfig",
    "QLinear",
    "LlamaLayer",
    "LlamaParams",
    "KVCache",
    "quantize_linear",
    "init_llama_params",
    "prefill",
    "decode_step",
    "LLAMA3_8B",
    "LLAMA3_70B",
    "TINY_LLAMA",
]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Static model hyperparameters (HF ``config.json`` field names)."""

    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    # HF "llama3"-type rope scaling: (factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings). None = off.
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    # Qwen2-style additive bias on the q/k/v projections (HF
    # config.json "attention_bias"; Llama models ship without it)
    attention_bias: bool = False
    # Mistral-style sliding-window attention: each query attends only
    # the last ``sliding_window`` positions (within the preallocated
    # cache — this bounds attention, it is not a ring buffer). None =
    # full causal.
    sliding_window: Optional[int] = None
    # decode attention via the Pallas flash-decode kernel
    # (ops/attention.py) instead of the XLA einsum path
    use_flash_attention: bool = False
    # Collective/compute overlap for the row-parallel (o/down) psums:
    # split the projection into this many output-row chunks and psum
    # each chunk as soon as its partial matmul finishes — the chunk
    # c psum has no data dependency on chunk c+1's compute, so XLA's
    # async-collective scheduler can overlap them. 1 = single psum
    # (identical program to before; the flag costs nothing at tp=1
    # because _ql_psum short-circuits).
    tp_overlap_chunks: int = 1
    # ---- Gemma-2 family knobs (defaults = Llama behavior) ----------
    # MLP activation: "silu" (Llama/Qwen/Mistral SwiGLU) or
    # "gelu_tanh" (Gemma GeGLU)
    hidden_activation: str = "silu"
    # Gemma sandwich norms: post-attention and post-MLP RMSNorms applied
    # to the block OUTPUT before the residual add (LlamaLayer gains
    # post_attn_norm / post_mlp_norm leaves when True)
    post_norms: bool = False
    # Gemma RMSNorm multiplies by (1 + weight) (zero-centered gains)
    norm_plus_one: bool = False
    # Gemma scales embeddings by bf16(sqrt(hidden_size))
    embed_normalizer: bool = False
    # Gemma-2 soft caps: cap * tanh(x / cap)
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    # attention score scale; None = head_dim ** -0.5 (Gemma-2 uses
    # query_pre_attn_scalar ** -0.5)
    query_scale: Optional[float] = None
    # which layers use the sliding window: "all" (Mistral), or the
    # Gemma-2 alternation ("even" / "odd" layer indices; pinned against
    # the transformers oracle in tests)
    sliding_layers: str = "all"
    # Qwen3-style per-head RMSNorm on q and k (weight [head_dim],
    # applied before RoPE)
    qk_norm: bool = False
    # KV cache element type: "bf16" (default) or "int8" — int8 stores
    # per-(layer, slot, head, token) absmax-scaled codes plus a bf16
    # step, halving attention HBM traffic (the long-context decode
    # bottleneck: at a 2k window the cache read dominates the step).
    # Quantize-on-write at the same granularity the attention reads.
    # Works with the einsum path, the flash-decode kernel
    # (flash_decode_attention_stacked_i8) and the paged pool
    # (paged_flash_decode_attention_i8); composes with TP/PP/SP — the
    # step planes shard/slice/rotate alongside the code planes.
    kv_cache_dtype: str = "bf16"
    # Paged attention: consecutive logical pages fetched per kernel
    # grid step (each its own block-table-aimed DMA issued in the same
    # step — deeper copy pipelining against the many-small-DMA latency
    # tax of short pages; see ops/paged_attention.py). Static under
    # jit; clamped to divide the attended table width. Default 2: wins
    # at EVERY page size raced (paged_sweep chain_r3d, B=8: p128
    # 337->314us, p256 191->169, p384 145->124; bitwise identical).
    paged_pages_per_step: int = 2
    quant: QuantConfig = QuantConfig()

    @property
    def q_size(self) -> int:
        return self.num_attention_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_key_value_heads * self.head_dim


LLAMA3_8B = LlamaConfig()

# Llama3-70B: ~35 GB packed 4-bit — needs tp >= 4 v5e chips (weights
# column/row-shard per parallel/shard.py; kv heads divide tp up to 8).
LLAMA3_70B = LlamaConfig(
    hidden_size=8192,
    intermediate_size=28672,
    num_hidden_layers=80,
    num_attention_heads=64,
    num_key_value_heads=8,
)

# Gemma2-9B (HF google/gemma-2-9b): sandwich norms, GeGLU, softcaps,
# alternating 4k sliding window. Conventions pinned against the
# transformers oracle in tests/test_hf_oracle.py.
GEMMA2_9B = LlamaConfig(
    vocab_size=256000,
    hidden_size=3584,
    intermediate_size=14336,
    num_hidden_layers=42,
    num_attention_heads=16,
    num_key_value_heads=8,
    head_dim=256,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    max_position_embeddings=8192,
    tie_word_embeddings=True,
    hidden_activation="gelu_tanh",
    post_norms=True,
    norm_plus_one=True,
    embed_normalizer=True,
    attn_logit_softcap=50.0,
    final_logit_softcap=30.0,
    query_scale=256.0,
    sliding_window=4096,
    sliding_layers="even",
)

# Tiny config for tests and mesh dry-runs: every tensor-parallel shard (up
# to tp=8) keeps K a multiple of the 64-element quant block.
TINY_LLAMA = LlamaConfig(
    vocab_size=1024,
    hidden_size=512,
    intermediate_size=1024,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=8,
    head_dim=64,
    rope_theta=10000.0,
    max_position_embeddings=256,
)


@struct.dataclass
class QLinear:
    """A 4-bit linear weight in the TPU runtime layout: packed int32
    words + resolved fp32 scales (double-quant already inverted — the
    load-time hoist of reference core.py:467).

    Two packed layouts share this container and are told apart by
    shape (no extra pytree field, so pspec/treedef maps stay trivial):

    - ``planar``: ``wp [out, in/8]`` — one row per output feature,
      8 codes per word (ops/gemv.py layout algebra).
    - ``pair``: ``wp [out/2, in/4]`` — SWAR row-pair layout for the
      fastest FP4 decode kernel (ops/qmatmul.py pair section).
    """

    wp: jnp.ndarray       # int32 [out, in//8] (planar) or [out/2, in//4]
    scales: jnp.ndarray   # float32/bf16 [out, in//64], or the bf16x2
    # packed row-pair storage: int32 [out/2, in//64] (merged bf16
    # pairs, ops/qmatmul.pack_scale_pairs — pair layout only; the pair
    # kernels consume it with zero per-step transform)

    @property
    def scales_packed(self) -> bool:
        return self.scales.dtype == jnp.int32

    @property
    def layout(self) -> str:
        if self.scales_packed:
            return "pair"
        return ("planar" if self.wp.shape[-2] == self.scales.shape[-2]
                else "pair")

    @property
    def out_features(self) -> int:
        rows = self.scales.shape[-2]
        return 2 * rows if self.scales_packed else rows

    @property
    def in_features(self) -> int:
        return self.scales.shape[-1] * 64


@struct.dataclass
class LlamaLayer:
    """One decoder layer's parameters. In :class:`LlamaParams` every leaf
    carries a leading ``[num_layers]`` axis and is consumed by
    ``lax.scan``. The bias fields are ``None`` for Llama checkpoints and
    bf16 vectors for Qwen2-style ``attention_bias`` models."""

    attn_norm: jnp.ndarray   # [hidden]
    q: QLinear
    k: QLinear
    v: QLinear
    o: QLinear
    mlp_norm: jnp.ndarray    # [hidden]
    gate: QLinear
    up: QLinear
    down: QLinear
    q_bias: Optional[jnp.ndarray] = None
    k_bias: Optional[jnp.ndarray] = None
    v_bias: Optional[jnp.ndarray] = None
    # Gemma sandwich norms (cfg.post_norms): applied to the attention /
    # MLP block OUTPUT before the residual add
    post_attn_norm: Optional[jnp.ndarray] = None
    post_mlp_norm: Optional[jnp.ndarray] = None
    # Qwen3 per-head q/k RMSNorm gains [head_dim] (cfg.qk_norm)
    q_norm: Optional[jnp.ndarray] = None
    k_norm: Optional[jnp.ndarray] = None
    # Serving-time fused projections (:func:`fuse_projections`): when
    # ``qkv``/``gate_up`` are set the per-projection fields above are
    # None and the forward slices one fused matmul's output instead of
    # dispatching three (q|k|v) / two (gate|up) kernels on the same
    # activations.
    qkv: Optional[QLinear] = None
    gate_up: Optional[QLinear] = None
    qkv_bias: Optional[jnp.ndarray] = None


@struct.dataclass
class LlamaParams:
    embed: Any               # bf16 [vocab, hidden] (bnb-style) or QLinear
    layers: LlamaLayer       # stacked: every leaf has leading [L]
    final_norm: jnp.ndarray  # [hidden]
    lm_head: Any             # QLinear (quantize_lm_head) or bf16 [vocab, hidden]


def fuse_projections(params: LlamaParams) -> LlamaParams:
    """Serving-time projection fusion: concatenate q|k|v (and gate|up)
    along OUTPUT rows into one stacked QLinear each, so the decode path
    runs 4 weight kernels per layer instead of 7 on the same
    activations — fewer dispatch prologues, one activation permute
    instead of three, and (crucial for the manual DMA pipeline) the kv
    projections stop being 2-chunk kernels that barely double-buffer:
    a Llama3-8B fused qkv streams 12 M-chunks.

    Valid for both packed layouts: the pair layout is row-pair-local
    with a K-only column map, so concatenating even-row-count pieces
    IS the fused pair array; scales/biases concatenate alongside. Row
    results are independent of the row-tile split, so logits are
    bit-identical to the unfused program (tested).

    Serving-time only: apply AFTER loading/TP-sharding decisions — the
    parallel factories (TP/PP/SP) and the bnb exporter consume the
    UNFUSED form (reference interop keeps per-projection tensors)."""
    st = params.layers
    if st.qkv is not None:
        return params

    def cat(lins):
        layouts = {l.layout for l in lins}
        if len(layouts) != 1:
            raise ValueError(f"cannot fuse mixed layouts {layouts}")
        sdt = {l.scales.dtype for l in lins}
        if len(sdt) != 1:
            raise ValueError(f"cannot fuse mixed scale dtypes {sdt}")
        # packed bf16x2 scales concatenate exactly like the wp words:
        # the pair layout is row-pair-local, each piece has even rows
        return QLinear(
            wp=jnp.concatenate([l.wp for l in lins], axis=-2),
            scales=jnp.concatenate([l.scales for l in lins], axis=-2))

    qkv_bias = None
    if st.q_bias is not None:
        qkv_bias = jnp.concatenate([st.q_bias, st.k_bias, st.v_bias],
                                   axis=-1)
    layers = st.replace(
        qkv=cat([st.q, st.k, st.v]), gate_up=cat([st.gate, st.up]),
        qkv_bias=qkv_bias,
        q=None, k=None, v=None, gate=None, up=None,
        q_bias=None, k_bias=None, v_bias=None)
    return params.replace(layers=layers)


@struct.dataclass
class KVCache:
    """Preallocated paged-less KV cache: ``[L, B, kv_heads, max_seq, head_dim]``.

    Head-major layout: each head's ``[S, D]`` plane is contiguous, which
    is what both the flash-decode kernel blocks and the einsum path want.
    Functional updates via ``dynamic_update_slice`` on a donated carry —
    XLA performs them in place, so decode does not rewrite the cache.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    # int8 cache: per-token dequant steps [L, B, KV, S] bf16 (None for
    # the bf16 cache — the pytree stays two-leaf so existing pspec /
    # donation plumbing is untouched)
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: LlamaConfig, batch: int, max_seq: int,
               kv_heads: Optional[int] = None,
               dtype: Any = None) -> "KVCache":
        kv = kv_heads if kv_heads is not None else cfg.num_key_value_heads
        shape = (cfg.num_hidden_layers, batch, kv, max_seq, cfg.head_dim)
        if dtype is None:
            dtype = (jnp.int8 if cfg.kv_cache_dtype == "int8"
                     else jnp.bfloat16)
        if jnp.dtype(dtype) == jnp.int8:
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(shape[:4], jnp.bfloat16),
                       v_scale=jnp.zeros(shape[:4], jnp.bfloat16))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]


# --------------------------------------------------------------------------
# Parameter construction
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "quant_type", "compress_statistics",
                     "scales_dtype", "layout"),
)
def quantize_linear(
    W: jnp.ndarray,
    blocksize: int = 64,
    quant_type: str = "fp4",
    compress_statistics: bool = True,
    scales_dtype=jnp.float32,
    layout: str = "auto",
) -> QLinear:
    """Quantize a ``[out, in]`` weight into the runtime :class:`QLinear`
    form (packed words + resolved scales). The full bnb ``QuantState`` is
    produced/consumed at the checkpoint layer; the model runtime keeps
    only what the kernels need.

    On TPU the weight quantization runs as a Pallas kernel
    (ops/quantize.py, bit-identical to the functional path); the absmax
    double-quantization (1/64th of the data) stays functional."""
    out_f, in_f = W.shape
    if jax.default_backend() == "tpu":
        from ..ops.quantize import quantize_4bit_pallas

        wp, absmax2d = quantize_4bit_pallas(
            W, blocksize=blocksize, quant_type=quant_type)
        absmax = absmax2d.reshape(-1)
        if compress_statistics:
            # double-quant round-trip of the statistics: the resolved
            # scales must be the values a bnb consumer would decode
            # (reference core.py:563-576)
            from ..quant.functional import (
                dequantize_blockwise,
                quantize_blockwise,
            )

            offset = jnp.mean(absmax)
            q8, st2 = quantize_blockwise(absmax - offset, blocksize=256)
            absmax = dequantize_blockwise(q8, st2) + offset
        scales = absmax.reshape(out_f, in_f // blocksize)
    else:
        packed, state = quantize_4bit(
            W, blocksize=blocksize, quant_type=quant_type,
            compress_statistics=compress_statistics,
        )
        wp = pack_i32_rows(packed, out_f, in_f)
        scales = dequantize_absmax(state).reshape(out_f, in_f // blocksize)
    if blocksize != 64:
        scales = jnp.repeat(scales, blocksize // 64, axis=1)
    if layout == "auto":
        # FP4's SWAR bit-arithmetic pair decode wins decisively. NF4
        # pair decode lost as long as it was tree-only (24.9 vs 30.2
        # tok/s e2e), but the gather+tree dual-issue mix
        # (pair_patterns_mix) beats the planar gather mix at the kernel
        # level (199.5us vs 247.4us at [14336,4096] T=1,
        # benchmarks/nf4_mechanism_probe.py), so both codebooks now
        # default to the pair layout
        layout = "pair" if out_f % 2 == 0 else "planar"
    if layout == "pair":
        from ..ops.qmatmul import planar_to_pair

        wp = planar_to_pair(wp)
    if scales_dtype == "bf16x2":
        if layout != "pair":
            # planar/row-sharded weights keep float scales (the packed
            # row-pair word has no meaning there) — fp32, the
            # kernel-neutral storage. TP's o/down shards land here.
            return QLinear(wp=wp, scales=scales.astype(jnp.float32))
        # merged bf16 row-pair scale words (half the fp32 bytes; the
        # pair kernels' own storage form)
        from ..ops.qmatmul import pack_scale_pairs

        return QLinear(wp=wp, scales=pack_scale_pairs(scales))
    return QLinear(wp=wp, scales=scales.astype(scales_dtype))


_PROXY_SLAB_ELEMS = 1 << 28   # sample in slabs above ~1 GB fp32


def _proxy_weight(key: jnp.ndarray, out_f: int, in_f: int,
                  scale: float) -> jnp.ndarray:
    """Trained-distribution weight proxy (no real checkpoint can exist
    in this environment — zero egress; PARITY.md documents the
    blocker). Mimics the statistics that make quantization HARD on
    real LLM weights, which an i.i.d. Gaussian lacks entirely:

    - heavy tails (Student-t df=5: excess kurtosis ~6, matching the
      leptokurtic weight histograms of trained transformers),
    - per-output-channel scale spread (log-normal row norms, sigma 0.4),
    - rare outlier input channels (~0.5% of columns at 8x — the
      well-documented transformer outlier-channel phenomenon), which
    inflate 64-block absmax and crush small values — exactly the
    regime where 4-bit codebooks lose accuracy."""
    k1, k2, k3 = jax.random.split(key, 3)
    # The Student-t sampler (gamma rejection loop) keeps O(10) fp32
    # buffers of the output shape live; at vocab-sized matrices
    # ([128256, 4096] = 2.1 GB fp32 each) that is a ~38 GB transient —
    # the round-3/4 8B-proxy OOM (chain_r4b parity_8b). Large matrices
    # therefore sample in row slabs under lax.map (sequential, one
    # slab's sampler buffers live at a time).
    if out_f * in_f >= _PROXY_SLAB_ELEMS and out_f % 16 == 0:
        slabs = 16
        keys = jax.random.split(k1, slabs)
        W = jax.lax.map(
            lambda kk: jax.random.t(
                kk, df=5.0, shape=(out_f // slabs, in_f),
                dtype=jnp.float32),
            keys).reshape(out_f, in_f)
    else:
        W = jax.random.t(k1, df=5.0, shape=(out_f, in_f),
                         dtype=jnp.float32)
    row = jnp.exp(0.4 * jax.random.normal(k2, (out_f, 1), jnp.float32))
    outlier = jnp.where(
        jax.random.bernoulli(k3, 0.005, (1, in_f)), 8.0, 1.0)
    return W * row * outlier * jnp.float32(scale)


def init_llama_params(
    cfg: LlamaConfig, seed: int = 0, scale: float = 0.02,
    dist: str = "normal",
) -> LlamaParams:
    """Random-initialized quantized model (bench/tests; real checkpoints
    come from :mod:`quantizations_tpu.models.hf_loader`).

    ``dist="trained_proxy"`` draws weights/norms from the
    trained-checkpoint proxy distribution (:func:`_proxy_weight`) for
    accuracy evaluation without a real checkpoint.

    Memory discipline: layers are generated+quantized one at a time and
    written into a preallocated stacked buffer with a donated in-place
    update — peak HBM is the final model plus ONE dense layer (a naive
    build-then-stack holds 2x the transformer weights, which together
    with generate's footprint exceeds a v5e's 16 GB for 8B)."""
    q = cfg.quant
    proxy = dist == "trained_proxy"
    key = jax.random.PRNGKey(seed)
    h, qs, kvs, inter = (cfg.hidden_size, cfg.q_size, cfg.kv_size,
                         cfg.intermediate_size)

    def dense(key, out_f, in_f):
        if proxy:
            return _proxy_weight(key, out_f, in_f, scale)
        return jax.random.normal(key, (out_f, in_f), jnp.float32) * scale

    def norm_gain(key):
        if proxy:
            # trained RMSNorm gains cluster near 1 with real spread
            return jnp.abs(
                1.0 + 0.3 * jax.random.normal(key, (h,), jnp.float32)
            ).astype(jnp.bfloat16)
        return jnp.ones((h,), jnp.bfloat16)

    def qlin(key, out_f, in_f, scales_dtype=None):
        W = dense(key, out_f, in_f)
        return quantize_linear(
            W, blocksize=q.blocksize, quant_type=q.quant_type,
            compress_statistics=q.compress_statistics,
            scales_dtype=(q.scales_dtype if scales_dtype is None
                          else scales_dtype),
        )

    def make_layer(i: int) -> LlamaLayer:
        ks = jax.random.split(jax.random.fold_in(key, i), 9)
        def b(key, n):
            if not cfg.attention_bias:
                return None
            return (jax.random.normal(key, (n,), jnp.float32)
                    * scale).astype(jnp.bfloat16)

        kb = jax.random.split(jax.random.fold_in(key, i + 10**5), 5)
        return LlamaLayer(
            attn_norm=norm_gain(ks[7]),
            q=qlin(ks[0], qs, h),
            k=qlin(ks[1], kvs, h),
            v=qlin(ks[2], kvs, h),
            o=qlin(ks[3], h, qs),
            mlp_norm=norm_gain(ks[8]),
            gate=qlin(ks[4], inter, h),
            up=qlin(ks[5], inter, h),
            down=qlin(ks[6], h, inter),
            q_bias=b(kb[0], qs), k_bias=b(kb[1], kvs), v_bias=b(kb[2], kvs),
            post_attn_norm=norm_gain(kb[3]) if cfg.post_norms else None,
            post_mlp_norm=norm_gain(kb[4]) if cfg.post_norms else None,
            q_norm=(jnp.ones((cfg.head_dim,), jnp.bfloat16)
                    if cfg.qk_norm else None),
            k_norm=(jnp.ones((cfg.head_dim,), jnp.bfloat16)
                    if cfg.qk_norm else None),
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_layer(stacked, layer, i):
        return jax.tree.map(
            lambda s, l: jax.lax.dynamic_update_slice_in_dim(
                s, l[None], i, axis=0),
            stacked, layer)

    layer0 = make_layer(0)
    L = cfg.num_hidden_layers
    layers = jax.tree.map(
        lambda x: jnp.zeros((L,) + x.shape, x.dtype), layer0)
    layers = write_layer(layers, layer0, jnp.int32(0))
    del layer0
    for i in range(1, L):
        layers = write_layer(layers, make_layer(i), jnp.int32(i))

    ke, kh, kn = jax.random.split(jax.random.fold_in(key, 10**6), 3)
    if q.quantize_embedding:
        # the embedding is a per-token ROW GATHER (embed_lookup), so
        # packed row-pair scales don't apply — bf16 scales give the
        # same bytes as bf16x2 and stay gatherable
        embed = qlin(ke, cfg.vocab_size, h,
                     scales_dtype=(jnp.bfloat16
                                   if q.scales_dtype == "bf16x2"
                                   else None))
    else:
        embed = (dense(ke, cfg.vocab_size, h).astype(jnp.bfloat16)
                 if proxy else
                 jax.random.normal(ke, (cfg.vocab_size, h), jnp.bfloat16)
                 * scale)
    if q.quantize_lm_head:
        lm_head = qlin(kh, cfg.vocab_size, h)
    else:
        lm_head = (dense(kh, cfg.vocab_size, h).astype(jnp.bfloat16)
                   if proxy else
                   jax.random.normal(kh, (cfg.vocab_size, h),
                                     jnp.bfloat16) * scale)
    return LlamaParams(
        embed=embed, layers=layers,
        final_norm=norm_gain(kn), lm_head=lm_head,
    )


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in fp32 (matching HF Llama numerics), output bf16-castable."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)


def _norm(x: jnp.ndarray, w: jnp.ndarray, cfg: "LlamaConfig") -> jnp.ndarray:
    """RMSNorm with the family's gain convention: Llama multiplies by
    ``w``, Gemma by ``1 + w`` (zero-centered gains, HF Gemma2RMSNorm)."""
    wf = w.astype(jnp.float32)
    if cfg.norm_plus_one:
        wf = wf + 1.0
    return rms_norm(x, wf, cfg.rms_norm_eps)


def _act(g: jnp.ndarray, cfg: "LlamaConfig") -> jnp.ndarray:
    """Gated-MLP activation: SwiGLU silu (Llama) or GeGLU tanh-gelu
    (Gemma, HF "gelu_pytorch_tanh")."""
    if cfg.hidden_activation == "gelu_tanh":
        return jax.nn.gelu(g, approximate=True)
    return jax.nn.silu(g)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float,
    rope_scaling: Optional[Tuple[float, float, float, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables ``[T, head_dim]`` (HF non-interleaved convention:
    the table is the half-table tiled twice). ``rope_scaling`` applies the
    HF "llama3" frequency rescaling used by the Llama3 Instruct
    checkpoints."""
    inv = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if rope_scaling is not None:
        factor, low_f, high_f, orig_max = rope_scaling
        wavelen = 2.0 * jnp.pi / inv
        low_wl = orig_max / low_f
        high_wl = orig_max / high_f
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        smoothed = (1 - smooth) * inv / factor + smooth * inv
        inv = jnp.where(
            wavelen > low_wl, inv / factor,
            jnp.where(wavelen < high_wl, inv, smoothed),
        )
    ang = positions.astype(jnp.float32)[..., None] * inv  # [..., D/2]
    ang = jnp.concatenate([ang, ang], axis=-1)             # [..., D]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> jnp.ndarray:
    """``x [B, T, H, D]`` with cos/sin ``[B, T, D]`` — HF ``rotate_half``."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rot * s


def embed_lookup(embed: Any, token_ids: jnp.ndarray,
                 quant_type: str = "fp4") -> jnp.ndarray:
    """Embedding gather; for a quantized table, gather the packed rows
    and scales and dequantize just those rows (B*T rows of work, plain
    XLA — this runs outside any Pallas kernel)."""
    if not isinstance(embed, QLinear):
        return embed[token_ids].astype(jnp.bfloat16)
    from ..ops.gemv import _SHIFTS
    from ..quant.codebooks import get_4bit_code

    code = jnp.asarray(get_4bit_code(quant_type))
    s = embed.scales[token_ids].astype(jnp.float32)  # [..., H/64]
    srep = jnp.repeat(s, 8, axis=-1)                 # [..., H/8]
    if embed.layout == "pair":
        # pair layout: token row r lives in word row r//2, 16-bit half
        # r%2; the word axis is block-major (ops/qmatmul.py) — undo
        # that per gathered row, then the halves expose plane nibbles
        from ..ops.qmatmul import _unblockmajor

        g2 = embed.wp[token_ids // 2]                # [..., H/4] int32
        h = (g2 >> (16 * (token_ids % 2))[..., None]) & 0xFFFF
        k8 = h.shape[-1] // 2
        gE = _unblockmajor(h[..., :k8])
        gO = _unblockmajor(h[..., k8:])
        planes = [jnp.take(code, (gE >> (4 * p)) & 15, axis=0) * srep
                  for p in range(4)]
        planes += [jnp.take(code, (gO >> (4 * p)) & 15, axis=0) * srep
                   for p in range(4)]
        g = gE
    else:
        g = embed.wp[token_ids]                      # [..., H/8] int32
        planes = [jnp.take(code, (g >> sh) & 15, axis=0) * srep
                  for sh in _SHIFTS]                 # each [..., H/8]
    # element 8c+j comes from plane j: stack minor then flatten
    out = jnp.stack(planes, axis=-1)
    return out.reshape(*g.shape[:-1], g.shape[-1] * 8).astype(jnp.bfloat16)


def _ql(x2: jnp.ndarray, lin: QLinear, qcfg: QuantConfig,
        idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply a (possibly layer-stacked) QLinear. Stacked weights on the
    decode path go through the scalar-prefetch kernel, which reads layer
    ``idx`` straight out of the stacked HBM buffer — slicing the stack
    with XLA would copy every weight byte once per call (SURVEY.md §7
    hard part 3: decode is HBM-bound, traffic is the budget)."""
    from ..nn.linear import (GEMV_MAX_TOKENS, PAIR_QMATMUL_MAX_TOKENS,
                             QMATMUL_MAX_TOKENS)

    if qcfg.dense_twin:
        # accuracy-twin path: dense bf16 weights, MXU matmul (same
        # math as evals/parity's dense reference projection). The
        # dequant is transient inside the jitted step.
        from ..nn.linear import dense_weight

        if lin.wp.ndim == 3:
            lin = QLinear(wp=lin.wp[idx], scales=lin.scales[idx])
        W = dense_weight(lin.wp, lin.scales, qcfg.quant_type, lin.layout)
        return jnp.dot(x2.astype(jnp.bfloat16), W.T,
                       preferred_element_type=jnp.float32)

    if lin.wp.ndim == 3:
        tokens = x2.shape[0]
        on_tpu = jax.default_backend() == "tpu"
        pair = lin.layout == "pair"
        from ..ops.qmatmul import pair_tokens_ok

        if (pair and tokens <= PAIR_QMATMUL_MAX_TOKENS and on_tpu
                and pair_tokens_ok(tokens)):
            from ..ops.qmatmul import manual_vmem_ok

            # bf16x2 packed scales: 2 effective bytes per logical row.
            # Packed + manual at tokens>=4 OOMs Mosaic's scoped stack
            # on chip (chain_r5e) — packed scales stay on grid (which
            # ties manual at decode shapes anyway).
            s_item = (2 if lin.scales_packed
                      else lin.scales.dtype.itemsize)
            if (qcfg.pair_pipeline == "manual"
                    and not lin.scales_packed
                    and (2 * lin.wp.shape[-2]) % 128 == 0
                    and manual_vmem_ok(
                        2 * lin.wp.shape[-2], 4 * lin.wp.shape[-1],
                        tokens, s_item)):
                from ..ops.qmatmul import matmul_4bit_pair_manual_stacked

                return matmul_4bit_pair_manual_stacked(
                    lin.wp, lin.scales, x2.astype(qcfg.compute_dtype),
                    idx, quant_type=qcfg.quant_type,
                    decode=qcfg.pair_decode)
            from ..ops.qmatmul import matmul_4bit_pair_pallas_stacked

            return matmul_4bit_pair_pallas_stacked(
                lin.wp, lin.scales, x2.astype(qcfg.compute_dtype), idx,
                quant_type=qcfg.quant_type, decode=qcfg.pair_decode)
        if pair and on_tpu and _PREFILL_PAIR and tokens % 8 == 0:
            # round-5 experimental prefill path (QT_PREFILL_PAIR=1):
            # decode-once pair kernel instead of the dense dequant
            # materialization; raced on chip by chain_r5j
            from ..ops.qmatmul import pair_prefill_matmul, prefill_pair_ok

            if prefill_pair_ok(2 * lin.wp.shape[-2], lin.wp.shape[-1],
                               min(tokens, 512)):
                return pair_prefill_matmul(
                    lin.wp, lin.scales, x2.astype(qcfg.compute_dtype),
                    qcfg.quant_type, decode=qcfg.pair_decode,
                    layer_idx=idx)
        qmm_ok = tokens in (1, 2, 4) or tokens % 8 == 0
        if not pair and tokens <= QMATMUL_MAX_TOKENS and qmm_ok and on_tpu:
            from ..ops.qmatmul import matmul_4bit_pallas_stacked

            return matmul_4bit_pallas_stacked(
                lin.wp, lin.scales, x2.astype(qcfg.compute_dtype), idx,
                quant_type=qcfg.quant_type)
        if not pair and tokens <= GEMV_MAX_TOKENS and on_tpu:
            return gemv_4bit_pallas_stacked(
                lin.wp, lin.scales, x2.astype(qcfg.compute_dtype), idx,
                quant_type=qcfg.quant_type)
        lin = QLinear(wp=lin.wp[idx], scales=lin.scales[idx])
    return apply_4bit(
        x2, lin.wp, lin.scales, qcfg.quant_type,
        compute_dtype=qcfg.compute_dtype,
        pair_pipeline=qcfg.pair_pipeline,
        fp4_decode=qcfg.pair_decode,
    )


def _ql_psum(x2: jnp.ndarray, lin: QLinear, qcfg: QuantConfig,
             idx: Optional[jnp.ndarray], axis_name: Optional[str],
             chunks: int) -> jnp.ndarray:
    """Row-parallel projection + tp reduction, optionally chunked for
    collective/compute overlap (SURVEY.md §2.3 TP row: "ICI collectives
    overlapped with dequant-matmul by splitting ... and pipelining").

    ``chunks > 1`` splits the OUTPUT rows into static slices: partial c
    is psum'd while partial c+1 is still computing (independent
    dataflow — XLA schedules the collectives async). Chunking the
    output axis keeps total communication volume identical to the
    single psum, and per-row kernel math is unchanged (row results are
    independent of the row-tile split), so logits are bit-identical to
    the unchunked program on matching backends (tested)."""
    if axis_name is None:
        return _ql(x2, lin, qcfg, idx)
    M = lin.wp.shape[-2]          # row-parallel shards are planar
    if chunks <= 1 or lin.layout == "pair" or M % chunks:
        return jax.lax.psum(_ql(x2, lin, qcfg, idx), axis_name)
    mc = M // chunks
    outs = []
    for c in range(chunks):
        sl = QLinear(wp=lin.wp[..., c * mc:(c + 1) * mc, :],
                     scales=lin.scales[..., c * mc:(c + 1) * mc, :])
        outs.append(jax.lax.psum(_ql(x2, sl, qcfg, idx), axis_name))
    return jnp.concatenate(outs, axis=-1)


def quantize_kv_i8(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 quantize-on-write for KV rows: per-token absmax step over
    the trailing [D] axis (the same granularity the attention read
    dequantizes at — one bf16 step per row, 1/128 of the code bytes).
    The step is rounded to its bf16 STORAGE precision before computing
    codes so write and read use the same step (quantizing against the
    fp32 step would add a systematic ~0.2% dequant bias). Shared by the
    slot-cache layer body and the paged decode step."""
    tf = t.astype(jnp.float32)
    step = (jnp.max(jnp.abs(tf), axis=-1) * (1.0 / 127.0)
            ).astype(jnp.bfloat16)
    stepf = step.astype(jnp.float32)
    codes = jnp.round(tf / jnp.maximum(stepf, 1e-12)[..., None])
    return jnp.clip(codes, -127, 127).astype(jnp.int8), step


def layer_window(cfg: "LlamaConfig", i):
    """(use_win, win_eff) for GLOBAL layer index ``i`` (traced under a
    scan or static): the single source of the Gemma-2 window
    alternation, shared by the main scan body, the PP stage bodies, the
    SP ring trunk and the paged forward so the per-family rule can't
    drift between them.

    ``use_win``: None when no per-layer toggle applies (window on every
    layer, or no window at all), else a traced bool — ``sliding_layers
    == "even"`` slides layers 0, 2, ... (the transformers Gemma-2
    convention). ``win_eff``: traced effective window for the
    flash/paged kernels (``2**30`` sentinel = effectively global), or
    None when the config has no window."""
    if cfg.sliding_window is None:
        return None, None
    if cfg.sliding_layers == "all":
        return None, jnp.int32(cfg.sliding_window)
    use_win = ((i % 2) == 0 if cfg.sliding_layers == "even"
               else (i % 2) == 1)
    win_eff = jnp.where(use_win, jnp.int32(cfg.sliding_window),
                        jnp.int32(2 ** 30))
    return use_win, win_eff


def _layer_forward(
    x: jnp.ndarray,              # [B, T, hidden]
    layer: LlamaLayer,           # single layer (no L axis)
    ck: jnp.ndarray,             # [L, B, KV, S, D] FULL stacked cache
    cv: jnp.ndarray,
    pos: jnp.ndarray,            # [B] int32: per-slot write offsets
    cos: jnp.ndarray,            # [B, T, D]
    sin: jnp.ndarray,
    mask: jnp.ndarray,           # [B, T, S] bool: True = attend
    cfg: LlamaConfig,
    axis_name: Optional[str] = None,
    idx: Optional[jnp.ndarray] = None,   # layer index for stacked weights
                                         # AND the cache layer slot
    attend_len: Optional[int] = None,    # static: attention reads only
                                         # cache[:, :attend_len]
    cks: Optional[jnp.ndarray] = None,   # int8 cache: [L, B, KV, S] bf16
    cvs: Optional[jnp.ndarray] = None,   # dequant steps (None = bf16 cache)
    win_eff: Optional[jnp.ndarray] = None,  # traced effective sliding
    # window for THIS layer (int32; huge = global layer). Enables the
    # flash-decode path for sliding-window configs; when None the
    # einsum path's mask carries the window instead.
) -> Tuple[jnp.ndarray, ...]:
    """One decoder layer. Head counts derive from the (per-shard) weight
    shapes so the same code runs under shard_map. ``pos`` is per-batch-slot
    (continuous batching: every slot sits at its own sequence offset).

    The STACKED cache is passed whole and updated with per-row
    single-position ``dynamic_update_slice`` (in place on the scan
    carry); attention reads a pure layer slice. Extracting a per-layer
    cache, updating it, and writing it back (the previous structure)
    made XLA materialize the full layer slice twice per layer — measured
    ~35% of decode step time at batch 4, 2k cache.

    ``attend_len`` bounds the attention window to the valid cache prefix
    — at a 8k max_seq, reading the whole preallocated cache would cost
    ~1 GB/token; bucketing the attended length to the live maximum
    position keeps it proportional to actual sequence lengths."""
    B, T, h = x.shape
    D = cfg.head_dim
    if layer.qkv is not None:
        # fused serving form: per-shard counts derive from the fused
        # output rows and the (shard-invariant) q:kv head ratio, so the
        # same code runs single-device and under shard_map
        r = cfg.num_attention_heads // cfg.num_key_value_heads
        n_kv = (layer.qkv.out_features // D) // (r + 2)
        n_q = r * n_kv
    else:
        n_q = layer.q.out_features // D     # per-shard query heads
        n_kv = layer.k.out_features // D    # per-shard kv heads
    G = n_q // n_kv
    qcfg = cfg.quant

    # -- attention --
    with jax.named_scope("attn"):
        xa = _norm(x, layer.attn_norm, cfg)
        x2 = xa.astype(qcfg.compute_dtype).reshape(B * T, h)
        if layer.qkv is not None:
            qkv = _ql(x2, layer.qkv, qcfg, idx)
            if layer.qkv_bias is not None:
                qkv = qkv + layer.qkv_bias.astype(qkv.dtype)
            qd, kd = n_q * D, n_kv * D
            q = qkv[:, :qd]
            k = qkv[:, qd:qd + kd]
            v = qkv[:, qd + kd:]
        else:
            q = _ql(x2, layer.q, qcfg, idx)
            k = _ql(x2, layer.k, qcfg, idx)
            v = _ql(x2, layer.v, qcfg, idx)
            if layer.q_bias is not None:
                q = q + layer.q_bias.astype(q.dtype)
                k = k + layer.k_bias.astype(k.dtype)
                v = v + layer.v_bias.astype(v.dtype)
        q = q.reshape(B, T, n_q, D)
        k = k.reshape(B, T, n_kv, D)
        v = v.reshape(B, T, n_kv, D)
        if layer.q_norm is not None:
            # Qwen3 per-head RMSNorm before RoPE
            q = rms_norm(q, layer.q_norm, cfg.rms_norm_eps)
            k = rms_norm(k, layer.k_norm, cfg.rms_norm_eps)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        li = jnp.int32(0) if idx is None else idx
        kn = k.swapaxes(1, 2)                    # [B, KV, T, D]
        vn = v.swapaxes(1, 2)
        if cks is not None:
            kn, kstep = quantize_kv_i8(kn)
            vn, vstep = quantize_kv_i8(vn)
        else:
            kn = kn.astype(ck.dtype)
            vn = vn.astype(cv.dtype)
        for b in range(B):
            at = (li, jnp.int32(b), jnp.int32(0), pos[b], jnp.int32(0))
            ck = jax.lax.dynamic_update_slice(ck, kn[b][None, None], at)
            cv = jax.lax.dynamic_update_slice(cv, vn[b][None, None], at)
            if cks is not None:
                cks = jax.lax.dynamic_update_slice(
                    cks, kstep[b][None, None], at[:4])
                cvs = jax.lax.dynamic_update_slice(
                    cvs, vstep[b][None, None], at[:4])
        cache_k = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
        cache_v = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)

        S_att = attend_len or cache_k.shape[2]
        if (cfg.use_flash_attention and T == 1
                and (cfg.sliding_window is None or win_eff is not None)):
            # family knobs ride the kernel: query_scale/softcap compile
            # in statically, the sliding window arrives traced via the
            # scalar-prefetch vector (per-layer alternation under scan)
            fscale = (cfg.query_scale or D) ** -0.5
            fcap = cfg.attn_logit_softcap
            fwin = win_eff if cfg.sliding_window is not None else None
            if cks is not None:
                from ..ops.attention import (
                    flash_decode_attention_stacked_i8)

                attn = flash_decode_attention_stacked_i8(
                    q[:, 0].reshape(B, n_kv, G, D), ck, cv, cks, cvs,
                    li, pos + 1, attend_len=S_att,
                    interpret=jax.default_backend() != "tpu",
                    scale=fscale, softcap=fcap, window=fwin,
                ).reshape(B * T, n_q * D)
            else:
                from ..ops.attention import flash_decode_attention_stacked

                attn = flash_decode_attention_stacked(
                    q[:, 0].reshape(B, n_kv, G, D), ck, cv, li, pos + 1,
                    attend_len=S_att,
                    interpret=jax.default_backend() != "tpu",
                    scale=fscale, softcap=fcap, window=fwin,
                ).reshape(B * T, n_q * D)
        else:
            # MXU attention with cache-native (bf16) operands and fp32
            # accumulation: casting the cache slice to fp32 materialized
            # 2x the cache bytes through HBM per layer (measured ~2x the
            # attention floor at a 2k window); softmax stays fp32.
            # XLA:CPU has no bf16 dot -> fp32 operands off-TPU.
            on_tpu = jax.default_backend() == "tpu"
            adt = (jnp.float32 if not on_tpu
                   else jnp.bfloat16 if cks is not None else cache_k.dtype)
            kf = cache_k[:, :, :S_att].astype(adt)
            vf = cache_v[:, :, :S_att].astype(adt)
            if cks is not None:
                ksl = jax.lax.dynamic_index_in_dim(cks, li, 0,
                                                   keepdims=False)
                vsl = jax.lax.dynamic_index_in_dim(cvs, li, 0,
                                                   keepdims=False)
                kf = kf * ksl[:, :, :S_att, None].astype(adt)
                vf = vf * vsl[:, :, :S_att, None].astype(adt)
            qg = q.reshape(B, T, n_kv, G, D).astype(adt)
            scores = jnp.einsum(
                "btkgd,bksd->btkgs", qg, kf,
                preferred_element_type=jnp.float32
            ) * ((cfg.query_scale or D) ** -0.5)
            if cfg.attn_logit_softcap is not None:
                cap = cfg.attn_logit_softcap
                scores = cap * jnp.tanh(scores / cap)
            scores = jnp.where(mask[:, :, None, None, :], scores, -1e30)
            w = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("btkgs,bksd->btkgd", w.astype(vf.dtype), vf,
                              preferred_element_type=jnp.float32)
            attn = attn.reshape(B * T, n_q * D)

        o = _ql_psum(attn, layer.o, qcfg, idx, axis_name,
                     cfg.tp_overlap_chunks)
        ob = o.reshape(B, T, h)
        if layer.post_attn_norm is not None:
            ob = _norm(ob, layer.post_attn_norm, cfg)
        x = x + ob.astype(x.dtype)

    # -- MLP (SwiGLU / GeGLU) --
    with jax.named_scope("mlp"):
        xm = _norm(x, layer.mlp_norm, cfg)
        x2 = xm.astype(qcfg.compute_dtype).reshape(B * T, h)
        if layer.gate_up is not None:
            gu = _ql(x2, layer.gate_up, qcfg, idx)
            inter = gu.shape[-1] // 2
            g, u = gu[:, :inter], gu[:, inter:]
        else:
            g = _ql(x2, layer.gate, qcfg, idx)
            u = _ql(x2, layer.up, qcfg, idx)
        act = _act(g, cfg) * u
        d = _ql_psum(act.astype(qcfg.compute_dtype), layer.down, qcfg,
                     idx, axis_name, cfg.tp_overlap_chunks)
        db = d.reshape(B, T, h)
        if layer.post_mlp_norm is not None:
            db = _norm(db, layer.post_mlp_norm, cfg)
        x = x + db.astype(x.dtype)
    if cks is not None:
        return x, ck, cv, cks, cvs
    return x, ck, cv


def _forward(
    params: LlamaParams,
    token_ids: jnp.ndarray,      # [B, T]
    cache: KVCache,
    pos: jnp.ndarray,            # scalar int32 or [B] (per-slot offsets)
    cfg: LlamaConfig,
    axis_name: Optional[str] = None,
    last_token_only: bool = False,
    attend_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Shared prefill/decode forward: embeds ``T`` tokens written at cache
    positions ``pos .. pos+T`` (``pos`` may be per-batch-slot, the
    continuous-batching case), returns logits ``[B, T, vocab(_shard)]``
    (``T=1`` when ``last_token_only`` — generation never needs prompt
    logits, and the 128k-vocab head over the full prompt is the largest
    transient of the prefill) and the updated cache. One ``lax.scan``
    over the stacked layers."""
    B, T = token_ids.shape
    S = cache.max_seq
    x = embed_lookup(params.embed, token_ids,
                     cfg.quant.quant_type)             # [B, T, hidden]
    if cfg.embed_normalizer:
        # Gemma scales embeddings by sqrt(hidden) (HF casts the
        # normalizer to the activation dtype)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)

    pos = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), (B,))
    positions = pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            cfg.rope_scaling)               # [B, T, D]
    # mask[b, t, s]: attend iff s is a written position not after query t.
    S_att = attend_len or S
    key_pos = jnp.arange(S_att, dtype=jnp.int32)
    mask_full = key_pos[None, None, :] <= positions[:, :, None]
    mask = mask_full                                    # [B, T, S_att]
    if cfg.sliding_window is not None:
        mask = mask & (key_pos[None, None, :]
                       > positions[:, :, None] - cfg.sliding_window)

    stacked = params.layers  # every QLinear leaf keeps its [L] axis; the
    # scan body passes the layer index down so the decode kernel can read
    # layer i in place (no per-step weight copy). Only the tiny norm
    # vectors are sliced.

    int8_kv = cache.k_scale is not None

    def body(carry, i):
        x, ck, cv, cks, cvs = carry
        layer = LlamaLayer(
            attn_norm=stacked.attn_norm[i], mlp_norm=stacked.mlp_norm[i],
            q=stacked.q, k=stacked.k, v=stacked.v, o=stacked.o,
            gate=stacked.gate, up=stacked.up, down=stacked.down,
            q_bias=(None if stacked.q_bias is None else stacked.q_bias[i]),
            k_bias=(None if stacked.k_bias is None else stacked.k_bias[i]),
            v_bias=(None if stacked.v_bias is None else stacked.v_bias[i]),
            post_attn_norm=(None if stacked.post_attn_norm is None
                            else stacked.post_attn_norm[i]),
            post_mlp_norm=(None if stacked.post_mlp_norm is None
                           else stacked.post_mlp_norm[i]),
            q_norm=(None if stacked.q_norm is None else stacked.q_norm[i]),
            k_norm=(None if stacked.k_norm is None else stacked.k_norm[i]),
            qkv=stacked.qkv, gate_up=stacked.gate_up,
            qkv_bias=(None if stacked.qkv_bias is None
                      else stacked.qkv_bias[i]),
        )
        use_win, win_eff = layer_window(cfg, i)
        mask_i = (mask if use_win is None
                  else jnp.where(use_win, mask, mask_full))
        out = _layer_forward(
            x, layer, ck, cv, pos, cos, sin, mask_i, cfg,
            axis_name=axis_name, idx=i, attend_len=attend_len,
            cks=cks, cvs=cvs, win_eff=win_eff,
        )
        if int8_kv:
            return out, None
        x, ck, cv = out
        return (x, ck, cv, None, None), None

    idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    (x, ck, cv, cks, cvs), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), idx)

    if last_token_only:
        x = x[:, -1:, :]
        B, T = x.shape[0], 1
    x = _norm(x, params.final_norm, cfg)
    if isinstance(params.lm_head, QLinear):
        logits = _ql(
            x.astype(cfg.quant.compute_dtype).reshape(B * T, -1),
            params.lm_head, cfg.quant,
        ).reshape(B, T, -1)
    else:
        logits = jnp.einsum(
            "bth,vh->btv", x.astype(jnp.bfloat16),
            params.lm_head, preferred_element_type=jnp.float32,
        )
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    if axis_name is not None:
        # lm_head is vocab-sharded (column-parallel): gather the shards.
        logits = jax.lax.all_gather(logits, axis_name, axis=-1, tiled=True)
    return logits, KVCache(k=ck, v=cv, k_scale=cks, v_scale=cvs)


def prefill(params: LlamaParams, token_ids: jnp.ndarray, cache: KVCache,
            cfg: LlamaConfig, pos: Optional[jnp.ndarray] = None,
            axis_name: Optional[str] = None,
            last_token_only: bool = False,
            attend_len: Optional[int] = None) -> Tuple[jnp.ndarray, KVCache]:
    """Process a prompt chunk; returns (logits [B, T, vocab], cache).
    ``attend_len`` (static) bounds attention to the valid cache prefix —
    used by the engine's speculative verify windows at large max_seq."""
    if pos is None:
        pos = jnp.int32(0)
    return _forward(params, token_ids, cache, pos, cfg, axis_name=axis_name,
                    last_token_only=last_token_only, attend_len=attend_len)


def decode_step(params: LlamaParams, token_ids: jnp.ndarray, cache: KVCache,
                pos: jnp.ndarray, cfg: LlamaConfig,
                axis_name: Optional[str] = None,
                attend_len: Optional[int] = None,
                ) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step: ``token_ids [B, 1]`` at position ``pos``.
    Returns (logits [B, vocab], cache). This is the hot loop — under jit
    it is one fused program (vs the reference's 448 launches/token,
    SURVEY.md §3.2). ``attend_len`` (static) bounds attention to the
    valid cache prefix; callers must guarantee ``pos < attend_len``."""
    logits, cache = _forward(params, token_ids, cache, pos, cfg,
                             axis_name=axis_name, attend_len=attend_len)
    return logits[:, -1, :], cache
