"""Flash-decode attention Pallas kernel (GQA, batch decode).

SURVEY.md §5 long-context plan: "decode attention via Pallas flash-decode
kernel". The XLA-fusion attention materializes [B, T, KV, G, S] scores
and reads the cache at fusion speed; this kernel streams the KV cache
block-by-block with an online-softmax accumulator, so decode attention
runs at HBM stream bandwidth and scales to long contexts.

Shapes (decode: one query token per sequence):
  q        [B, KVH, G, D]   (G = query heads per kv head)
  cache_k  [B, KVH, S, D]   (head-major: contiguous [S, D] per head —
  cache_v  [B, KVH, S, D]    also the only layout whose blocks satisfy
                             Mosaic's (8,128)-divisibility rule)
  lengths  [B]              attend to positions < lengths[b]
  out      [B, KVH, G, D]   fp32

Grid: (B * KVH, S // S_BLK); the S dimension is sequential ("arbitrary")
with running (max, sum, acc) state in VMEM scratch, flushed to the
output on the last S block — the standard flash-decode recurrence.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_decode_attention", "flash_decode_attention_stacked",
           "flash_decode_attention_stacked_i8"]

_NEG = -1e30


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
            *, s_blk, scale, n_kv, len_off=0, softcap=None, window=None,
            win_slot=None, q_span=1, q_heads=None, sq=None, nsq=None):
    # ``sq``/``nsq`` override the sequence-step identity when a caller
    # runs SEVERAL logical S-blocks inside one grid step (the paged
    # multi-page-per-step variant): ``sq`` is the logical block index,
    # ``nsq`` the logical block count. Defaults read the grid.
    if sq is None:
        sq = pl.program_id(1)
    if nsq is None:
        nsq = pl.num_programs(1)
    b = len_off + pl.program_id(0) // n_kv

    q = q_ref[0, 0].astype(jnp.float32) * scale     # [G, D]
    k = k_ref[0, 0].astype(jnp.float32)             # [S_BLK, D]
    v = v_ref[0, 0].astype(jnp.float32)             # [S_BLK, D]

    @pl.when(sq == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], _NEG)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [G, S_BLK]
    if softcap is not None:
        # Gemma-2 attn_logit_softcap (applied pre-mask, like the HF ref)
        s = softcap * jnp.tanh(s * (1.0 / softcap))
    span = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + sq * s_blk
    if q_span > 1:
        # speculative verify window: the q block stacks ``q_span``
        # consecutive query POSITIONS x ``q_heads`` heads (row r is
        # position r // q_heads). Query position p sits at
        # len-1+p and attends span <= len-1+p — causal INSIDE the
        # freshly written window.
        qpos = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                // q_heads)
        vis = span < len_ref[b] + qpos
    else:
        qpos = 0
        vis = span < len_ref[b]
    if window is not None or win_slot is not None:
        # decode: query position p sits at len-1+p — sliding window
        # means attend iff (len-1+p) - s < window. ``win_slot`` reads
        # the window from the scalar-prefetch vector (traced — Gemma-2
        # alternates windowed/global per layer under one scan; a huge
        # value disables the mask for global layers).
        win = len_ref[win_slot] if win_slot is not None else window
        vis &= span > len_ref[b] - 1 + qpos - win
    s = jnp.where(vis, s, _NEG)

    m_prev = m_scr[:, 0:1]                          # [G, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                          # [G, S_BLK]
    corr = jnp.exp(m_prev - m_new)                  # [G, 1]
    l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[:] * corr + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [G, D]

    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new
    acc_scr[:] = acc

    @pl.when(sq == nsq - 1)
    def _flush():
        l = l_scr[:, 0:1]
        o_ref[0, 0] = acc_scr[:] / jnp.where(l > 0, l, 1.0)


def _kernel_i8(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
               m_scr, l_scr, acc_scr, *, s_blk, scale, n_kv, len_off=0,
               softcap=None, win_slot=None, q_span=1, q_heads=None,
               sq=None, nsq=None):
    """int8-cache variant: per-token dequant steps are folded into
    COLUMN scalings (k rows scale the score columns, v rows scale the
    probability columns) — lane-natural, no transposes, and the int8
    cache blocks stream at half the bf16 bytes."""
    if sq is None:
        sq = pl.program_id(1)
    if nsq is None:
        nsq = pl.num_programs(1)
    b = len_off + pl.program_id(0) // n_kv

    q = q_ref[0, 0].astype(jnp.float32) * scale     # [G, D]
    k = k_ref[0, 0].astype(jnp.float32)             # [S_BLK, D] int8->f32
    v = v_ref[0, 0].astype(jnp.float32)
    ks = ks_ref[0, 0].astype(jnp.float32)           # [1, S_BLK]
    vs = vs_ref[0, 0].astype(jnp.float32)

    @pl.when(sq == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], _NEG)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * ks
    if softcap is not None:
        s = softcap * jnp.tanh(s * (1.0 / softcap))
    span = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + sq * s_blk
    if q_span > 1:
        qpos = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                // q_heads)
        vis = span < len_ref[b] + qpos
    else:
        qpos = 0
        vis = span < len_ref[b]
    if win_slot is not None:
        vis &= span > len_ref[b] - 1 + qpos - len_ref[win_slot]
    s = jnp.where(vis, s, _NEG)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[:] * corr + jax.lax.dot_general(
        p * vs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new
    acc_scr[:] = acc

    @pl.when(sq == nsq - 1)
    def _flush():
        l = l_scr[:, 0:1]
        o_ref[0, 0] = acc_scr[:] / jnp.where(l > 0, l, 1.0)


@functools.partial(jax.jit, static_argnames=("s_blk", "interpret", "scale",
                                             "softcap", "window"))
def flash_decode_attention(
    q: jnp.ndarray,        # [B, KVH, G, D]
    cache_k: jnp.ndarray,  # [B, KVH, S, D]
    cache_v: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] int32: attend to s < lengths[b]
    s_blk: int = 256,
    interpret: bool = False,
    scale: Optional[float] = None,     # default D**-0.5
    softcap: Optional[float] = None,   # Gemma-2 attn logit softcap
    window: Optional[int] = None,      # Mistral sliding window
) -> jnp.ndarray:
    """Online-softmax decode attention over the cache prefix. Returns
    fp32 ``[B, KVH, G, D]``."""
    B, KVH, G, D = q.shape
    S = cache_k.shape[2]
    while S % s_blk:
        s_blk //= 2
    scale = scale if scale is not None else D ** -0.5

    kernel = functools.partial(_kernel, s_blk=s_blk, scale=scale,
                               n_kv=KVH, softcap=softcap, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, 1, G, D),
                         lambda i, sq, ln: (i // KVH, i % KVH, 0, 0)),
            pl.BlockSpec((1, 1, s_blk, D),
                         lambda i, sq, ln: (i // KVH, i % KVH, sq, 0)),
            pl.BlockSpec((1, 1, s_blk, D),
                         lambda i, sq, ln: (i // KVH, i % KVH, sq, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda i, sq, ln: (i // KVH, i % KVH, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),   # running max (col 0)
            pltpu.VMEM((G, 128), jnp.float32),   # running sum (col 0)
            pltpu.VMEM((G, D), jnp.float32),     # running acc
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), q, cache_k, cache_v)


@functools.partial(jax.jit, static_argnames=("attend_len", "s_blk",
                                             "interpret", "scale",
                                             "softcap"))
def flash_decode_attention_stacked(
    q: jnp.ndarray,        # [B, KVH, G, D]
    cache_k: jnp.ndarray,  # [L, B, KVH, S, D] FULL stacked cache
    cache_v: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    lengths: jnp.ndarray,    # [B] int32: attend to s < lengths[b]
    attend_len: Optional[int] = None,  # static prefix bound (<= S)
    s_blk: int = 256,
    interpret: bool = False,
    scale: Optional[float] = None,     # default D**-0.5
    softcap: Optional[float] = None,   # Gemma-2 attn logit softcap
    window: Optional[jnp.ndarray] = None,  # TRACED effective sliding
    # window (int32 scalar) — per-layer under one scan: the caller
    # passes a huge value for global-attention layers (Gemma-2
    # alternation); None compiles the mask out entirely
) -> jnp.ndarray:
    """Layer-indexed flash decode over the STACKED cache: the kernel's
    DMAs read layer ``layer_idx`` (and only the first ``attend_len``
    positions) straight from the full HBM buffer via scalar-prefetch
    index maps. Passing a sliced cache to ``pallas_call`` instead forces
    XLA to materialize the slice — measured ~5 ms/step extra at batch 8,
    2k cache (the reason the sliced kernel lost to the einsum path)."""
    B, KVH, G, D = q.shape
    S = cache_k.shape[3]
    S_att = attend_len or S
    while S_att % s_blk:
        s_blk //= 2
    scale = scale if scale is not None else D ** -0.5

    kernel = functools.partial(
        _kernel, s_blk=s_blk, scale=scale, n_kv=KVH, len_off=1,
        softcap=softcap,
        win_slot=(1 + B) if window is not None else None)

    def k_wrap(scalars_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
               acc_scr):
        # scalars: [1 + B] = layer idx then lengths (len_off skips idx)
        kernel(scalars_ref, q_ref, k_ref[0], v_ref[0], o_ref,
               m_scr, l_scr, acc_scr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH, S_att // s_blk),
        in_specs=[
            pl.BlockSpec((1, 1, G, D),
                         lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
            pl.BlockSpec((1, 1, 1, s_blk, D),
                         lambda i, sq, sc: (sc[0], i // KVH, i % KVH,
                                            sq, 0)),
            pl.BlockSpec((1, 1, 1, s_blk, D),
                         lambda i, sq, sc: (sc[0], i // KVH, i % KVH,
                                            sq, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    parts = [jnp.asarray(layer_idx, jnp.int32).reshape(1),
             jnp.asarray(lengths, jnp.int32).reshape(B)]
    if window is not None:
        parts.append(jnp.asarray(window, jnp.int32).reshape(1))
    scalars = jnp.concatenate(parts)
    return pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scalars, q, cache_k, cache_v)


@functools.partial(jax.jit, static_argnames=("attend_len", "s_blk",
                                             "interpret", "scale",
                                             "softcap"))
def flash_decode_attention_stacked_i8(
    q: jnp.ndarray,        # [B, KVH, G, D]
    cache_k: jnp.ndarray,  # [L, B, KVH, S, D] int8 stacked cache
    cache_v: jnp.ndarray,
    k_scale: jnp.ndarray,  # [L, B, KVH, S] bf16 dequant steps
    v_scale: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    lengths: jnp.ndarray,    # [B] int32
    attend_len: Optional[int] = None,
    s_blk: int = 256,
    interpret: bool = False,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
    window: Optional[jnp.ndarray] = None,  # traced effective window
) -> jnp.ndarray:
    """Layer-indexed flash decode over the stacked INT8 cache
    (kv_cache_dtype="int8"): the code blocks stream from HBM at half
    the bf16 bytes plus 1/128 for the steps; dequant happens in-VMEM as
    column scalings (see :func:`_kernel_i8`)."""
    B, KVH, G, D = q.shape
    S = cache_k.shape[3]
    S_att = attend_len or S
    while S_att % s_blk:
        s_blk //= 2
    scale = scale if scale is not None else D ** -0.5

    kernel = functools.partial(
        _kernel_i8, s_blk=s_blk, scale=scale, n_kv=KVH, len_off=1,
        softcap=softcap,
        win_slot=(1 + B) if window is not None else None)

    def k_wrap(scalars_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
               m_scr, l_scr, acc_scr):
        kernel(scalars_ref, q_ref, k_ref[0], v_ref[0], ks_ref[0],
               vs_ref[0], o_ref, m_scr, l_scr, acc_scr)

    cblk = pl.BlockSpec((1, 1, 1, s_blk, D),
                        lambda i, sq, sc: (sc[0], i // KVH, i % KVH,
                                           sq, 0))
    # Scale planes ride as [L, B*KVH, 1, S]: a (1, 1, 1, s_blk) block
    # over the natural [L, B, KVH, S] layout has last-two block dims
    # (1, s_blk) against array dims (KVH, S) — Mosaic rejects it on
    # hardware whenever KVH > 1 (the sublane dim must be divisible by 8
    # or equal). The no-copy reshape makes the second-minor array dim 1
    # so the block is equal-dimensioned. (Interpret-mode CI does not
    # enforce the block rule; caught on-chip by paged_sweep, r3.)
    L = k_scale.shape[0]
    S_full = k_scale.shape[3]
    k_scale = k_scale.reshape(L, B * KVH, 1, S_full)
    v_scale = v_scale.reshape(L, B * KVH, 1, S_full)
    sblk = pl.BlockSpec((1, 1, 1, s_blk),
                        lambda i, sq, sc: (sc[0], i, 0, sq))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH, S_att // s_blk),
        in_specs=[
            pl.BlockSpec((1, 1, G, D),
                         lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
            cblk, cblk, sblk, sblk,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda i, sq, sc: (i // KVH, i % KVH, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, D), jnp.float32),
        ],
    )
    parts = [jnp.asarray(layer_idx, jnp.int32).reshape(1),
             jnp.asarray(lengths, jnp.int32).reshape(B)]
    if window is not None:
        parts.append(jnp.asarray(window, jnp.int32).reshape(1))
    scalars = jnp.concatenate(parts)
    return pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scalars, q, cache_k, cache_v, k_scale, v_scale)
