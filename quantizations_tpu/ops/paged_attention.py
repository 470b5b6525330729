"""Paged flash-decode attention (vLLM-style block tables, TPU-native).

The slot cache (models/llama.KVCache) preallocates ``max_seq`` per slot
— fine for few uniform sequences, wasteful for many variable-length
ones. Paged serving splits the cache into fixed-size pages indexed per
sequence through a block table; memory scales with LIVE tokens.

On TPU the block table slots straight into the Pallas machinery: the
table is a scalar-prefetch argument and the kernel's BlockSpec index
map reads ``table[b, j]`` to aim each DMA at the right page of the
global pool — the indirection costs nothing at kernel time (it is
resolved while the previous block streams). This is the idiomatic
TPU analogue of CUDA paged-attention's per-block pointer chase.

Pool layout: ``pages_k/v [L, P, KVH, page_size, D]`` with ONE block
table shared by all layers (a sequence's pages are allocated once;
layer ``li`` is an index-map coordinate, same mechanism as the stacked
weight kernels). Unused table entries may hold any valid page id —
``lengths`` masks them out of the softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _kernel, _kernel_i8

__all__ = ["paged_flash_decode_attention",
           "paged_flash_decode_attention_i8"]


def _clamp_pps(max_pages: int, pages_per_step: int) -> int:
    while max_pages % pages_per_step:
        pages_per_step //= 2
    return max(pages_per_step, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "scale",
                                             "softcap", "q_span",
                                             "pages_per_step"))
def paged_flash_decode_attention(
    q: jnp.ndarray,          # [B, KVH, q_span*G, D]
    pages_k: jnp.ndarray,    # [L, P, KVH, page, D]
    pages_v: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, max_pages] int32 page ids
    layer_idx: jnp.ndarray,    # scalar int32
    lengths: jnp.ndarray,      # [B] int32: attend to s < lengths[b]
    interpret: bool = False,
    scale: Optional[float] = None,     # default D**-0.5
    softcap: Optional[float] = None,   # Gemma-2 attn logit softcap
    window: Optional[jnp.ndarray] = None,  # traced effective sliding
    # window (int32 scalar; huge value = global layer — see
    # ops/attention.flash_decode_attention_stacked)
    q_span: int = 1,   # consecutive query POSITIONS stacked in the q
    # block (speculative verify window): row t*G+g is position
    # lengths[b]-1+t, causally masked inside the window
    pages_per_step: int = 1,  # consecutive logical pages fetched per
    # grid step (each its own block-table DMA): one step overlaps
    # ``pages_per_step`` page fetches, attacking the many-small-DMA
    # latency tax of short pages (clamped to divide max_pages)
) -> jnp.ndarray:
    """Online-softmax decode attention over paged KV. Returns fp32
    ``[B, KVH, q_span*G, D]``. The sequence-position grid walks the
    block table; page ``j`` of row ``b`` covers positions
    ``[j*page, (j+1)*page)``."""
    B, KVH, QG, D = q.shape
    G = QG // q_span
    L, P, _, page, _ = pages_k.shape
    max_pages = block_table.shape[1]
    scale = scale if scale is not None else D ** -0.5
    pps = _clamp_pps(max_pages, pages_per_step)

    n_scalars = 1 + B * max_pages + B
    kernel = functools.partial(
        _kernel, s_blk=page, scale=scale, n_kv=KVH,
        len_off=1 + B * max_pages, softcap=softcap,
        win_slot=n_scalars if window is not None else None,
        q_span=q_span, q_heads=G)

    def k_wrap(scalars_ref, q_ref, *refs):
        # scalars: [1 + B*max_pages + B] = layer idx | table | lengths
        krefs, vrefs = refs[:pps], refs[pps:2 * pps]
        o_ref, m_scr, l_scr, acc_scr = refs[2 * pps:]
        for r in range(pps):
            kernel(scalars_ref, q_ref, krefs[r][0], vrefs[r][0], o_ref,
                   m_scr, l_scr, acc_scr,
                   sq=pl.program_id(1) * pps + r, nsq=max_pages)

    def page_of(i, sq, sc, r):
        b = i // KVH
        return sc[1 + b * max_pages + sq * pps + r]

    def cblk(r):
        return pl.BlockSpec(
            (1, 1, 1, page, D),
            lambda i, sq, sc: (sc[0], page_of(i, sq, sc, r),
                               i % KVH, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH, max_pages // pps),
        in_specs=[
            pl.BlockSpec((1, 1, QG, D),
                         lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
            *[cblk(r) for r in range(pps)],
            *[cblk(r) for r in range(pps)],
        ],
        out_specs=pl.BlockSpec(
            (1, 1, QG, D), lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((QG, 128), jnp.float32),
            pltpu.VMEM((QG, 128), jnp.float32),
            pltpu.VMEM((QG, D), jnp.float32),
        ],
    )
    parts = [jnp.asarray(layer_idx, jnp.int32).reshape(1),
             jnp.asarray(block_table, jnp.int32).reshape(B * max_pages),
             jnp.asarray(lengths, jnp.int32).reshape(B)]
    if window is not None:
        parts.append(jnp.asarray(window, jnp.int32).reshape(1))
    scalars = jnp.concatenate(parts)
    return pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, QG, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scalars, q, *([pages_k] * pps), *([pages_v] * pps))


@functools.partial(jax.jit, static_argnames=("interpret", "scale",
                                             "softcap", "q_span",
                                             "pages_per_step"))
def paged_flash_decode_attention_i8(
    q: jnp.ndarray,          # [B, KVH, q_span*G, D]
    pages_k: jnp.ndarray,    # [L, P, KVH, page, D] int8 codes
    pages_v: jnp.ndarray,
    scales_k: jnp.ndarray,   # [L, P, KVH, page] bf16 dequant steps
    scales_v: jnp.ndarray,
    block_table: jnp.ndarray,  # [B, max_pages] int32 page ids
    layer_idx: jnp.ndarray,    # scalar int32
    lengths: jnp.ndarray,      # [B] int32: attend to s < lengths[b]
    interpret: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    window: Optional[jnp.ndarray] = None,  # traced effective window
    q_span: int = 1,   # stacked query positions (verify window)
    pages_per_step: int = 1,  # logical pages fetched per grid step
) -> jnp.ndarray:
    """int8-pool variant of :func:`paged_flash_decode_attention`
    (kv_cache_dtype="int8"): code pages stream at half the bf16 bytes
    plus 1/128 for the step pages; dequant happens in-VMEM as column
    scalings (ops/attention._kernel_i8), the same block-table
    indirection aims every DMA."""
    B, KVH, QG, D = q.shape
    G = QG // q_span
    L, P, _, page, _ = pages_k.shape
    max_pages = block_table.shape[1]
    scale = scale if scale is not None else D ** -0.5
    pps = _clamp_pps(max_pages, pages_per_step)

    n_scalars = 1 + B * max_pages + B
    kernel = functools.partial(
        _kernel_i8, s_blk=page, scale=scale, n_kv=KVH,
        len_off=1 + B * max_pages, softcap=softcap,
        win_slot=n_scalars if window is not None else None,
        q_span=q_span, q_heads=G)

    def k_wrap(scalars_ref, q_ref, *refs):
        krefs, vrefs = refs[:pps], refs[pps:2 * pps]
        ksrefs, vsrefs = refs[2 * pps:3 * pps], refs[3 * pps:4 * pps]
        o_ref, m_scr, l_scr, acc_scr = refs[4 * pps:]
        for r in range(pps):
            kernel(scalars_ref, q_ref, krefs[r][0], vrefs[r][0],
                   ksrefs[r][0], vsrefs[r][0], o_ref,
                   m_scr, l_scr, acc_scr,
                   sq=pl.program_id(1) * pps + r, nsq=max_pages)

    def page_of(i, sq, sc, r):
        b = i // KVH
        return sc[1 + b * max_pages + sq * pps + r]

    def cblk(r):
        return pl.BlockSpec(
            (1, 1, 1, page, D),
            lambda i, sq, sc: (sc[0], page_of(i, sq, sc, r),
                               i % KVH, 0, 0))

    # Scale planes ride as [L, P*KVH, 1, page]: the natural
    # [L, P, KVH, page] layout gives a (1, 1, 1, page) block whose
    # second-minor dim (1) is neither divisible by 8 nor equal to KVH —
    # Mosaic rejects it on hardware for KVH > 1 (caught on-chip by
    # paged_sweep, r3; interpret CI does not enforce the block rule).
    # The no-copy reshape makes the block equal-dimensioned.
    scales_k = scales_k.reshape(L, P * KVH, 1, page)
    scales_v = scales_v.reshape(L, P * KVH, 1, page)

    def sblk(r):
        return pl.BlockSpec(
            (1, 1, 1, page),
            lambda i, sq, sc: (sc[0],
                               page_of(i, sq, sc, r) * KVH + i % KVH,
                               0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH, max_pages // pps),
        in_specs=[
            pl.BlockSpec((1, 1, QG, D),
                         lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
            *[cblk(r) for r in range(pps)],
            *[cblk(r) for r in range(pps)],
            *[sblk(r) for r in range(pps)],
            *[sblk(r) for r in range(pps)],
        ],
        out_specs=pl.BlockSpec(
            (1, 1, QG, D), lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((QG, 128), jnp.float32),
            pltpu.VMEM((QG, 128), jnp.float32),
            pltpu.VMEM((QG, D), jnp.float32),
        ],
    )
    parts = [jnp.asarray(layer_idx, jnp.int32).reshape(1),
             jnp.asarray(block_table, jnp.int32).reshape(B * max_pages),
             jnp.asarray(lengths, jnp.int32).reshape(B)]
    if window is not None:
        parts.append(jnp.asarray(window, jnp.int32).reshape(1))
    scalars = jnp.concatenate(parts)
    return pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, QG, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scalars, q, *([pages_k] * pps), *([pages_v] * pps),
      *([scales_k] * pps), *([scales_v] * pps))
