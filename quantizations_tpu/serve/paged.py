"""Paged KV serving: page pool + block tables + paged decode step.

The slot cache preallocates ``max_seq`` per slot; memory = slots x
max_seq whether sequences are long or short. The paged pool allocates
fixed-size pages on demand (vLLM-style): memory tracks LIVE tokens, so
many variable-length sequences fit the same HBM. See
ops/paged_attention.py for the TPU-native block-table kernel.

Pieces:
- :class:`PagedKVCache` — the device pool ``[L, P, KVH, page, D]``.
- :class:`PageAllocator` — host-side free list (the control plane is
  host code, as in the continuous-batching engine).
- :func:`paged_decode_step` — one T=1 decode step: paged attention via
  the block table + single-position paged KV writes.
- :func:`insert_prefill` — scatter a slot-layout scratch prefill into
  allocated pages (prefill itself reuses the dense prefill path).

Measured (v5e, 8B, ~1900-token context — paged_sweep chain_r3d): the
page-DMA tax is a pure page-size effect and 256-token pages erase it:
attention kernel at B=8 is 337 us with p128 (+76% over the 191.2 us
slot cache) but 191.2 us with p256 (0% tax) and 169.1 us with the
default pages_per_step=2 (12% BELOW slot — fewer padded positions per
block-table walk). p384 goes further (124-145 us) when max_seq allows
it. PagedEngine therefore auto-picks the largest page <= 256 dividing
max_seq; pass page_size= explicitly to trade memory granularity.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .engine import iter_prefill_chunks
from ..models.llama import (
    KVCache,
    LlamaConfig,
    LlamaLayer,
    LlamaParams,
    QLinear,
    _act,
    _norm,
    _ql,
    _ql_psum,
    apply_rope,
    embed_lookup,
    rms_norm,
    rope_cos_sin,
)

__all__ = ["PagedKVCache", "PageAllocator", "PagedEngine",
           "paged_decode_step", "paged_verify_step", "insert_prefill"]


@struct.dataclass
class PagedKVCache:
    """Device page pool. Page ``p`` of layer ``l`` holds ``page_size``
    consecutive positions of whichever sequence owns it. An int8 pool
    (kv_cache_dtype="int8") carries per-token bf16 dequant-step pages
    alongside the code pages — half the bf16 page bytes plus 1/128."""

    pages_k: jnp.ndarray   # [L, P, KVH, page, D]
    pages_v: jnp.ndarray
    # int8 pool: dequant steps [L, P, KVH, page] bf16 (None for bf16)
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, cfg: LlamaConfig, num_pages: int,
               page_size: int = 128, kv_heads: Optional[int] = None,
               dtype=None) -> "PagedKVCache":
        kv = kv_heads if kv_heads is not None else cfg.num_key_value_heads
        shape = (cfg.num_hidden_layers, num_pages, kv, page_size,
                 cfg.head_dim)
        if dtype is None:
            dtype = (jnp.int8 if cfg.kv_cache_dtype == "int8"
                     else jnp.bfloat16)
        if jnp.dtype(dtype) == jnp.int8:
            return cls(pages_k=jnp.zeros(shape, jnp.int8),
                       pages_v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(shape[:4], jnp.bfloat16),
                       v_scale=jnp.zeros(shape[:4], jnp.bfloat16))
        return cls(pages_k=jnp.zeros(shape, dtype),
                   pages_v=jnp.zeros(shape, dtype))

    @property
    def page_size(self) -> int:
        return self.pages_k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.pages_k.shape[1]


class _AdmitOOM(Exception):
    """Pool exhausted while finishing a batched admission; ``row`` is
    the first group row that could not be completed (rows before it
    were fully admitted)."""

    def __init__(self, row: int):
        super().__init__(f"pool exhausted at admission row {row}")
        self.row = row


class PageAllocator:
    """Host-side refcounted page free list. Page 0 is reserved as the
    junk page (unused block-table entries point at it — masked by
    lengths). Refcounts enable prefix caching: a page shared by several
    sequences (or pinned by the prefix cache) returns to the free list
    only when its last holder frees it."""

    def __init__(self, num_pages: int):
        self.num_usable = num_pages - 1   # page 0 is the junk page
        self._free: List[int] = list(range(num_pages - 1, 0, -1))
        self._refs: dict = {}

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"paged KV pool exhausted: need {n}, "
                f"free {len(self._free)}")
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self._refs[p] = 1
        return out

    def retain(self, page: int) -> None:
        """Add a holder to an allocated page (prefix-cache sharing)."""
        self._refs[page] += 1

    def refs(self, page: int) -> int:
        return self._refs.get(page, 0)

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if p == 0:
                continue
            self._refs[p] -= 1
            if self._refs[p] == 0:
                del self._refs[p]
                self._free.append(p)

    @property
    def available(self) -> int:
        return len(self._free)


def _write_row_window(buf, vals, i, p0, p1, off0, psz):
    """Write one row's T-token contiguous KV window into its (at most
    two) pages with 2 reads + 2 writes, independent of T.

    ``buf``: stacked page buffer, [L, pages, KV, psz, D] (or the 4D
    scale planes [L, pages, KV, psz]); ``vals``: [KV, T, ...] tokens at
    positions ``off0 + t`` of page ``p0``, spilling into ``p1``. The
    page-0 write is anchored at ``min(off0, psz - T)`` with the
    existing tail re-read and preserved below the window; the page-1
    write lands the spill at offset 0 and preserves the existing head —
    when the window does not cross a boundary it is redirected to the
    reserved junk page 0 (never attended, by the allocator contract).
    Replaces a T-long chain of single-token updates on the speculative
    verify path (2*B*T dependent HBM updates per layer -> 2*B)."""
    T = vals.shape[1]
    u = jnp.arange(T, dtype=jnp.int32)
    mshape = (1, T) + (1,) * (vals.ndim - 2)
    sizes = (1, 1) + vals.shape[:1] + (T,) + tuple(vals.shape[2:])
    zeros = (jnp.int32(0),) * (vals.ndim - 2)

    # page-0 side
    w0 = jnp.minimum(off0, psz - T)
    shift = off0 - w0                      # 0 unless the window crosses
    at0 = (i, p0, jnp.int32(0), w0) + zeros
    tail = jax.lax.dynamic_slice(buf, at0, sizes)[0, 0]
    slab0 = jnp.where((u >= shift).reshape(mshape),
                      jnp.roll(vals, shift, axis=1).astype(buf.dtype),
                      tail)
    buf = jax.lax.dynamic_update_slice(buf, slab0[None, None], at0)

    # page-1 side (spill, or junk page 0 when nothing crosses)
    spill = off0 + T - psz
    p1e = jnp.where(spill > 0, p1, jnp.int32(0))
    at1 = (i, p1e, jnp.int32(0), jnp.int32(0)) + zeros
    head = jax.lax.dynamic_slice(buf, at1, sizes)[0, 0]
    slab1 = jnp.where((u < spill).reshape(mshape),
                      jnp.roll(vals, spill, axis=1).astype(buf.dtype),
                      head)
    return jax.lax.dynamic_update_slice(buf, slab1[None, None], at1)


def _paged_forward(
    params: LlamaParams,
    token_ids: jnp.ndarray,    # [B, T]
    pages: PagedKVCache,
    block_table: jnp.ndarray,  # [B, table_width] int32
    pos: jnp.ndarray,          # [B] int32: row b's token t sits at
                               # position pos[b] + t
    cfg: LlamaConfig,
    max_pages: int,            # static: pages covered by attention
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """Shared paged forward (T=1 decode / T=K speculative verify):
    write row b's token t at (page=table[b, (pos+t)//page],
    offset=(pos+t)%page), attend the first ``max_pages`` table entries
    via the block-table flash kernel with ``q_span=T`` causal window
    masking. An int8 pool quantizes-on-write (per-token absmax, shared
    quantize_kv_i8 semantics) and attends through the i8 paged kernel.
    ``axis_name`` runs the Megatron TP pattern per shard (shard_map
    caller): kv-head-sharded pages, psum after o/down, vocab-sharded
    head gathered. Returns (logits [B, T, vocab], pages)."""
    from ..models.llama import layer_window, quantize_kv_i8
    from ..ops.paged_attention import (paged_flash_decode_attention,
                                       paged_flash_decode_attention_i8)

    B, T = token_ids.shape
    psz = pages.page_size
    qcfg = cfg.quant
    D = cfg.head_dim
    int8_kv = pages.k_scale is not None

    x = embed_lookup(params.embed, token_ids, qcfg.quant_type)
    if cfg.embed_normalizer:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    positions = pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin(positions, D, cfg.rope_theta, cfg.rope_scaling)

    page_of = jax.vmap(lambda t, p: t[p // psz])(
        block_table, positions)    # [B, T]
    off = positions % psz          # [B, T]

    stacked = params.layers
    pk, pv = pages.pages_k, pages.pages_v
    pks, pvs = pages.k_scale, pages.v_scale
    interp = jax.default_backend() != "tpu"

    def body(carry, i):
        x, pk, pv, pks, pvs = carry
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
        B_, T_, h = x.shape
        if layer.qkv is not None:
            # per-shard counts from the fused rows + q:kv head ratio
            # (shard-invariant) — works single-device and under shard_map
            r = cfg.num_attention_heads // cfg.num_key_value_heads
            n_kv = (layer.qkv.out_features // D) // (r + 2)
            n_q = r * n_kv
        else:
            n_q = layer.q.out_features // D
            n_kv = layer.k.out_features // D
        G = n_q // n_kv

        with jax.named_scope("attn"):
            xa = _norm(x, layer.attn_norm, cfg)
            x2 = xa.astype(qcfg.compute_dtype).reshape(B_ * T_, h)
            if layer.qkv is not None:
                qkv = _ql(x2, layer.qkv, qcfg, i)
                if layer.qkv_bias is not None:
                    qkv = qkv + layer.qkv_bias.astype(qkv.dtype)
                qd, kd = n_q * D, n_kv * D
                q = qkv[:, :qd]
                k = qkv[:, qd:qd + kd]
                v = qkv[:, qd + kd:]
            else:
                q = _ql(x2, layer.q, qcfg, i)
                k = _ql(x2, layer.k, qcfg, i)
                v = _ql(x2, layer.v, qcfg, i)
                if layer.q_bias is not None:
                    q = q + layer.q_bias.astype(q.dtype)
                    k = k + layer.k_bias.astype(k.dtype)
                    v = v + layer.v_bias.astype(v.dtype)
            q = q.reshape(B_, T_, n_q, D)
            k = k.reshape(B_, T_, n_kv, D)
            if layer.q_norm is not None:
                q = rms_norm(q, layer.q_norm, cfg.rms_norm_eps)
                k = rms_norm(k, layer.k_norm, cfg.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            v = v.reshape(B_, T_, n_kv, D)

            kn = k.swapaxes(1, 2)                    # [B, KV, T, D]
            vn = v.swapaxes(1, 2)
            if int8_kv:
                kn, kstep = quantize_kv_i8(kn)
                vn, vstep = quantize_kv_i8(vn)
            else:
                kn = kn.astype(pk.dtype)
                vn = vn.astype(pv.dtype)
            if T_ == 1:
                # plain decode: one tiny in-place update per row/plane
                for b in range(B_):
                    at = (i, page_of[b, 0], jnp.int32(0), off[b, 0],
                          jnp.int32(0))
                    pk = jax.lax.dynamic_update_slice(
                        pk, kn[b, :, 0:1][None, None], at)
                    pv = jax.lax.dynamic_update_slice(
                        pv, vn[b, :, 0:1][None, None], at)
                    if int8_kv:
                        pks = jax.lax.dynamic_update_slice(
                            pks, kstep[b, :, 0:1][None, None], at[:4])
                        pvs = jax.lax.dynamic_update_slice(
                            pvs, vstep[b, :, 0:1][None, None], at[:4])
            else:
                # verify window (T <= page_size): per-row two-page slab
                # writes instead of a T-long dependent update chain
                if T_ > psz:   # not assert: -O must not strip this
                    raise ValueError(
                        f"verify window {T_} exceeds page_size {psz}")
                for b in range(B_):
                    p0, p1 = page_of[b, 0], page_of[b, T_ - 1]
                    o0 = off[b, 0]
                    pk = _write_row_window(pk, kn[b], i, p0, p1, o0, psz)
                    pv = _write_row_window(pv, vn[b], i, p0, p1, o0, psz)
                    if int8_kv:
                        pks = _write_row_window(pks, kstep[b], i, p0,
                                                p1, o0, psz)
                        pvs = _write_row_window(pvs, vstep[b], i, p0,
                                                p1, o0, psz)

            _, win_eff = layer_window(cfg, i)
            # q rows packed position-major: row t*G+g = (position
            # pos+t, grouped head g) — matches the kernel's q_span
            # row->position rule
            qs = q.reshape(B_, T_, n_kv, G, D).transpose(0, 2, 1, 3, 4)
            qs = qs.reshape(B_, n_kv, T_ * G, D)
            if int8_kv:
                attn = paged_flash_decode_attention_i8(
                    qs, pk, pv, pks, pvs,
                    block_table[:, :max_pages], i, pos + 1,
                    interpret=interp,
                    scale=(cfg.query_scale or D) ** -0.5,
                    softcap=cfg.attn_logit_softcap, window=win_eff,
                    q_span=T_,
                    pages_per_step=cfg.paged_pages_per_step)
            else:
                attn = paged_flash_decode_attention(
                    qs, pk, pv,
                    block_table[:, :max_pages], i, pos + 1,
                    interpret=interp,
                    scale=(cfg.query_scale or D) ** -0.5,
                    softcap=cfg.attn_logit_softcap, window=win_eff,
                    q_span=T_,
                    pages_per_step=cfg.paged_pages_per_step)
            attn = attn.reshape(B_, n_kv, T_, G, D).transpose(
                0, 2, 1, 3, 4).reshape(B_ * T_, n_q * D)

            o = _ql_psum(attn.astype(qcfg.compute_dtype), layer.o,
                         qcfg, i, axis_name, cfg.tp_overlap_chunks)
            ob = o.reshape(B_, T_, h)
            if layer.post_attn_norm is not None:
                ob = _norm(ob, layer.post_attn_norm, cfg)
            x = x + ob.astype(x.dtype)

        with jax.named_scope("mlp"):
            xm = _norm(x, layer.mlp_norm, cfg)
            x2 = xm.astype(qcfg.compute_dtype).reshape(B_ * T_, h)
            if layer.gate_up is not None:
                gu = _ql(x2, layer.gate_up, qcfg, i)
                inter = gu.shape[-1] // 2
                g, u = gu[:, :inter], gu[:, inter:]
            else:
                g = _ql(x2, layer.gate, qcfg, i)
                u = _ql(x2, layer.up, qcfg, i)
            act = _act(g, cfg) * u
            d = _ql_psum(act.astype(qcfg.compute_dtype), layer.down,
                         qcfg, i, axis_name, cfg.tp_overlap_chunks)
            db = d.reshape(B_, T_, h)
            if layer.post_mlp_norm is not None:
                db = _norm(db, layer.post_mlp_norm, cfg)
            x = x + db.astype(x.dtype)
        return (x, pk, pv, pks, pvs), None

    idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    (x, pk, pv, pks, pvs), _ = jax.lax.scan(
        body, (x, pk, pv, pks, pvs), idx)

    xf = _norm(x, params.final_norm, cfg)
    x2 = xf.astype(qcfg.compute_dtype).reshape(B * T, -1)
    if isinstance(params.lm_head, QLinear):
        from ..nn.linear import apply_4bit

        logits = apply_4bit(x2, params.lm_head.wp, params.lm_head.scales,
                            qcfg.quant_type,
                            compute_dtype=qcfg.compute_dtype,
                            pair_pipeline=qcfg.pair_pipeline,
                            fp4_decode=qcfg.pair_decode)
    else:
        logits = jnp.dot(x2, params.lm_head.T.astype(x2.dtype),
                         preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32).reshape(B, T, -1)
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    if axis_name is not None:
        # lm_head is vocab-sharded (column-parallel): gather the shards
        logits = jax.lax.all_gather(logits, axis_name, axis=-1,
                                    tiled=True)
    return logits, PagedKVCache(pages_k=pk, pages_v=pv,
                                k_scale=pks, v_scale=pvs)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_pages"),
    donate_argnums=(2,),
)
def paged_decode_step(
    params: LlamaParams,
    token_ids: jnp.ndarray,    # [B, 1]
    pages: PagedKVCache,
    block_table: jnp.ndarray,  # [B, table_width] int32
    pos: jnp.ndarray,          # [B] int32
    cfg: LlamaConfig,
    max_pages: int,            # static: pages covered by attention
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """One T=1 decode step over the paged pool (see
    :func:`_paged_forward`). Returns (logits [B, vocab], pages)."""
    logits, pages = _paged_forward(params, token_ids, pages,
                                   block_table, pos, cfg, max_pages)
    return logits[:, 0], pages


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_pages"),
    donate_argnums=(2,),
)
def paged_verify_step(
    params: LlamaParams,
    token_ids: jnp.ndarray,    # [B, K]: pending token + K-1 drafts
    pages: PagedKVCache,
    block_table: jnp.ndarray,  # [B, table_width] int32
    pos: jnp.ndarray,          # [B] int32: first window position
    cfg: LlamaConfig,
    max_pages: int,
) -> Tuple[jnp.ndarray, PagedKVCache]:
    """Speculative verify window over the paged pool: K tokens per row
    written at pos..pos+K-1 and attended in ONE forward (the kernel's
    ``q_span`` masks causally inside the window). Rejected-draft keys
    above the committed position are garbage that the next window
    (written at the new, lower-or-equal base) overwrites before any
    query attends it — the slot engine's invariant, paged. Returns
    (logits [B, K, vocab], pages)."""
    return _paged_forward(params, token_ids, pages, block_table, pos,
                          cfg, max_pages)


def _paged_spec_impl(params, feed, pages, block_table, pos, draft,
                     samp, key, cfg, max_pages, axis_name=None):
    """Verify window + accept/correct in ONE dispatch (eager device
    round-trips are the engine's cost unit): returns (g [B, K] window
    tokens, a [B] accepted-draft counts, pages). ``samp`` is the
    [B, 3] (temperature, top_k, top_p) matrix; the accept/correct rule
    is temperature-only (exact speculative sampling is defined against
    the untruncated target distribution)."""
    from .speculative import spec_accept_sample_vec, spec_window_tokens

    logits, pages = _paged_forward(params, feed, pages, block_table,
                                   pos, cfg, max_pages,
                                   axis_name=axis_name)
    okk, corr = spec_accept_sample_vec(logits, draft, key, samp[:, 0])
    g, a = spec_window_tokens(okk, corr, draft)
    return g, a, pages


_paged_spec_step = functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_pages"),
    donate_argnums=(2,),
)(_paged_spec_impl)


def _paged_multi_impl(params, tokens, pages, block_table, pos, samp,
                      key, cfg, max_pages, n, axis_name=None):
    """``n`` decode steps over the paged pool in ONE dispatch (the slot
    engine's ``_make_multi_step`` over block tables): scan T=1 paged
    forwards, sampling each row with its own resolved
    (temperature, top_k, top_p) row of ``samp`` [B, 3]. Emitted[j] is
    the token vector fed INTO step j; the final carry is the next
    pending token per slot. Pages for positions pos..pos+n-1 must be
    pre-allocated in ``block_table``."""
    from .engine import sample_rows_samp

    def body(carry, k):
        tok, pages, pos_v = carry
        logits, pages = _paged_forward(params, tok[:, None], pages,
                                       block_table, pos_v, cfg,
                                       max_pages, axis_name=axis_name)
        nxt = sample_rows_samp(logits[:, 0], samp, k)
        return (nxt, pages, pos_v + 1), tok

    keys = jax.random.split(key, n)
    (tok, pages, _), emitted = jax.lax.scan(body, (tokens, pages, pos),
                                            keys)
    return tok, emitted.T, pages   # [B], [B, n], pool


_paged_multi_step = functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_pages", "n"),
    donate_argnums=(2,),
)(_paged_multi_impl)


def _paged_spec_multi_impl(params, pending, pages, block_table, pos,
                           hist, hcnt, samp, key, cfg, max_pages, n, k,
                           axis_name=None):
    """``n`` speculative verify windows in ONE dispatch (spec_k x
    steps_per_dispatch composition, VERDICT r2 #7): drafting moves
    ON-DEVICE (:func:`speculative.draft_prompt_lookup` over per-slot
    token-history buffers — the bigram rule; the host's single-window
    path drafts trigram-first, an intra-window quality difference that
    cannot change the committed stream, only the accept rate), so
    window j+1 can draft from window j's accepted tokens without a
    host round trip.

    hist [B, H] holds prompt + outputs + pending per row (the host
    convention), hcnt [B] its valid length. Returns (g [n, B, K]
    window tokens, a [n, B] accepted-draft counts, pool); the host
    walks the windows in order, committing pending_j + g_j[:a_j] and
    carrying pending_{j+1} = g_j[a_j]. Rows that retire mid-stream
    overshoot harmlessly inside their own (still-owned) pages — the
    multi-step window's invariant."""
    from .speculative import (draft_prompt_lookup,
                              spec_accept_sample_vec,
                              spec_window_tokens)

    H = hist.shape[1]
    idx = jnp.arange(k, dtype=jnp.int32)[None, :]

    def body(carry, kj):
        pending, pos_v, hist, hcnt, pages = carry
        draft = draft_prompt_lookup(hist, hcnt, k)
        feed = jnp.concatenate([pending[:, None], draft[:, :k - 1]],
                               axis=1)
        logits, pages = _paged_forward(params, feed, pages,
                                       block_table, pos_v, cfg,
                                       max_pages, axis_name=axis_name)
        okk, corr = spec_accept_sample_vec(logits, draft, kj,
                                           samp[:, 0])
        g, a = spec_window_tokens(okk, corr, draft)
        # append the accepted drafts AND the new pending g[a] to the
        # history (hist-includes-pending convention feeds the next
        # window's drafter)
        live = idx < (a + 1)[:, None]
        ppos = jnp.clip(hcnt[:, None] + idx, 0, H - 1)
        onehot = (ppos[:, :, None]
                  == jnp.arange(H, dtype=jnp.int32)[None, None, :])
        upd = jnp.sum(jnp.where(live[:, :, None] & onehot,
                                g[:, :, None], 0), axis=1)
        written = jnp.any(live[:, :, None] & onehot, axis=1)
        hist = jnp.where(written, upd, hist)
        pending = jnp.take_along_axis(g, a[:, None], axis=1)[:, 0]
        return (pending, pos_v + a + 1, hist, hcnt + a + 1,
                pages), (g, a)

    keys = jax.random.split(key, n)
    carry = (pending, pos, hist, hcnt, pages)
    (pending, pos, hist, hcnt, pages), (gs, accs) = jax.lax.scan(
        body, carry, keys)
    return gs, accs, pages   # [n, B, K], [n, B], pool


_paged_spec_multi_step = functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_pages", "n", "k"),
    donate_argnums=(2,),
)(_paged_spec_multi_impl)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_page(pages: PagedKVCache, scratch: KVCache,
                  src_start: jnp.ndarray, page_id: jnp.ndarray,
                  n: jnp.ndarray,
                  row: jnp.ndarray = 0) -> PagedKVCache:
    """Copy scratch positions [src_start, src_start+page) of slot
    ``row`` into pool page ``page_id`` (whole-page copy; positions past
    ``n`` are garbage that lengths-masking never reads). The scratch
    max_seq must be a multiple of the page size (dynamic_slice clamping
    would otherwise shift the final page's contents)."""
    psz = pages.page_size
    L = pages.pages_k.shape[0]
    KV = pages.pages_k.shape[2]
    D = pages.pages_k.shape[4]
    row = jnp.asarray(row, jnp.int32)
    sk = jax.lax.dynamic_slice(
        scratch.k, (0, row, 0, src_start, 0), (L, 1, KV, psz, D))
    sv = jax.lax.dynamic_slice(
        scratch.v, (0, row, 0, src_start, 0), (L, 1, KV, psz, D))
    at = (jnp.int32(0), page_id, jnp.int32(0), jnp.int32(0),
          jnp.int32(0))
    pk = jax.lax.dynamic_update_slice(pages.pages_k, sk, at)
    pv = jax.lax.dynamic_update_slice(pages.pages_v, sv, at)
    pks, pvs = pages.k_scale, pages.v_scale
    if pks is not None:
        sks = jax.lax.dynamic_slice(
            scratch.k_scale, (0, row, 0, src_start), (L, 1, KV, psz))
        svs = jax.lax.dynamic_slice(
            scratch.v_scale, (0, row, 0, src_start), (L, 1, KV, psz))
        pks = jax.lax.dynamic_update_slice(pks, sks, at[:4])
        pvs = jax.lax.dynamic_update_slice(pvs, svs, at[:4])
    return PagedKVCache(pages_k=pk, pages_v=pv, k_scale=pks,
                        v_scale=pvs)


def insert_prefill(pages: PagedKVCache, scratch: KVCache,
                   page_ids: List[int], plen: int,
                   start_page: int = 0, row: int = 0) -> PagedKVCache:
    """Scatter a slot-layout scratch prefill (batch slot ``row``,
    positions [0, plen)) into the allocated ``page_ids``.
    ``start_page`` skips the leading pages (prefix-cache hits whose KV
    is already in the pool — their scratch range was never
    prefilled)."""
    psz = pages.page_size
    need = -(-plen // psz)
    assert len(page_ids) >= need, (len(page_ids), need)
    for j in range(start_page, need):
        pages = _scatter_page(pages, scratch, jnp.int32(j * psz),
                              jnp.int32(page_ids[j]), jnp.int32(plen),
                              jnp.int32(row))
    return pages


@functools.partial(jax.jit, donate_argnums=(0,))
def _gather_page(scratch: KVCache, pages: PagedKVCache,
                 dst_start: jnp.ndarray, page_id: jnp.ndarray,
                 row: jnp.ndarray = 0) -> KVCache:
    """Copy pool page ``page_id`` into scratch positions
    [dst_start, dst_start + page) of slot ``row`` — the inverse of
    :func:`_scatter_page`, used to seed a prefill scratch with
    prefix-cache hits so the suffix prefill can attend them."""
    psz = pages.page_size
    L, _, KV, _, D = pages.pages_k.shape
    at_src = (jnp.int32(0), page_id, jnp.int32(0), jnp.int32(0),
              jnp.int32(0))
    sk = jax.lax.dynamic_slice(pages.pages_k, at_src, (L, 1, KV, psz, D))
    sv = jax.lax.dynamic_slice(pages.pages_v, at_src, (L, 1, KV, psz, D))
    at_dst = (jnp.int32(0), jnp.asarray(row, jnp.int32), jnp.int32(0),
              dst_start, jnp.int32(0))
    out = scratch.replace(
        k=jax.lax.dynamic_update_slice(scratch.k, sk.astype(
            scratch.k.dtype), at_dst),
        v=jax.lax.dynamic_update_slice(scratch.v, sv.astype(
            scratch.v.dtype), at_dst))
    if pages.k_scale is not None:
        sks = jax.lax.dynamic_slice(pages.k_scale, at_src[:4],
                                    (L, 1, KV, psz))
        svs = jax.lax.dynamic_slice(pages.v_scale, at_src[:4],
                                    (L, 1, KV, psz))
        out = out.replace(
            k_scale=jax.lax.dynamic_update_slice(out.k_scale, sks,
                                                 at_dst[:4]),
            v_scale=jax.lax.dynamic_update_slice(out.v_scale, svs,
                                                 at_dst[:4]))
    return out


class PagedEngine:
    """Continuous batching over the paged pool: slots hold sequence
    STATE only (the block table rows); KV memory is allocated
    page-by-page as sequences grow and freed on completion. Sampling is
    per-request: a [slots, 3] (temperature, top_k, top_p) matrix drives
    the shared :func:`engine.sample_rows` — greedy (temp 0),
    categorical, and per-request truncation, covering the first emitted
    token (admission) too; the engine-level top_k/top_p are defaults
    for requests that leave theirs unset.

    Admission prefills through the dense chunked path into a scratch
    slot cache, scatters it into freshly allocated pages, then decode
    runs :func:`paged_decode_step` with the batched block table.
    """

    def __init__(self, params: LlamaParams, cfg: LlamaConfig, *,
                 num_pages: int, page_size: Optional[int] = None,
                 slots: int = 4,
                 max_seq: int = 2048, prefill_buckets=(64, 256),
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, seed: int = 0,
                 prefix_cache: bool = False, admit_width: int = 4,
                 mesh=None):
        """``mesh``: a tp mesh (parallel.make_mesh) — params must
        already be placed with ``shard_llama_params``; the pool shards
        its kv heads over the mesh and every step/prefill runs under
        shard_map with the TP collectives (bf16 or int8 pool — the
        int8 dequant-step pages shard on the same kv-head axis)."""
        from collections import OrderedDict, deque

        import numpy as np

        from .engine import Request, sample_rows_samp

        if page_size is None:
            # 256-token pages erase the paged-attention tax entirely on
            # v5e (paged_sweep chain_r3d, B=8 ~1900-tok ctx: p128 337us
            # vs slot 191.2; p256 191.2 — 0% tax; with the default
            # pages_per_step=2 multi-page DMA steps, 169.1 = 12% BELOW
            # the slot cache). p384 kernels run 124-145us and WIN the
            # e2e race too (chain_r4d, max_seq 768 mixed 24-request
            # workload: 110.0 vs 108.4 tok/s aggregate), so prefer it
            # when max_seq allows; the cost is coarser pool granularity
            # (a short sequence pins a 384-token page). Tiny test
            # configs keep working via the small fallbacks.
            page_size = next((p for p in (384, 256, 128, 64, 32, 16, 8)
                              if max_seq % p == 0), 0)
        if not page_size or max_seq % page_size:
            raise ValueError("max_seq must be a multiple of page_size")
        self.params = params
        self.cfg = cfg
        self.page_size = page_size
        self.max_seq = max_seq
        self.slots = slots
        self.mesh = mesh
        # pluggable speculative drafter (see Engine.draft_fn); the
        # on-device drafting of step_spec_multi is unaffected
        from .engine import draft_lookup_host

        self.draft_fn = draft_lookup_host
        self.max_pages = max_seq // page_size
        self.pages = PagedKVCache.create(cfg, num_pages, page_size)
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel.shard import (AXIS, cache_pspec,
                                          llama_param_pspecs,
                                          paged_pool_pspec, validate_tp)

            validate_tp(cfg, mesh.shape[AXIS])
            self._axis = AXIS
            self._pspecs = llama_param_pspecs(
                cfg, fused=params.layers.qkv is not None)
            self._cspec = cache_pspec(cfg)
            self._ppspec = paged_pool_pspec(cfg)
            self.pages = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                self.pages, self._ppspec)
        self._mesh_fns: dict = {}
        self.alloc = PageAllocator(num_pages)
        self.table = np.zeros((slots, self.max_pages), np.int32)
        self.owned: List[List[int]] = [[] for _ in range(slots)]
        self.pos = np.zeros(slots, np.int32)
        self._cur = np.zeros(slots, np.int32)
        self.active: List[Optional[object]] = [None] * slots
        self.queue = deque()
        self.finished = {}
        self.on_token = None   # optional callable(Request, token_id)
        self._uid = 0
        from .engine import clamp_buckets

        self._buckets = clamp_buckets(prefill_buckets, max_seq)
        self._Request = Request
        self._np = np
        self._temp = temperature
        # prefix cache: hash of the token PREFIX ending at each full
        # page boundary -> pool page id. LRU-ordered; entries are
        # pinned with one allocator ref and evicted (oldest-first,
        # only if no live sequence shares them) when the pool runs dry.
        self._prefix = OrderedDict() if prefix_cache else None

        import jax as _jax

        self._admit_width = max(1, admit_width)
        self._top_k, self._top_p = top_k, top_p
        self._steps = 0
        self._spec_windows = 0
        # speculative acceptance accounting (Engine.stats contract)
        self._spec_drafted = 0
        self._spec_accepted = 0
        self._key = _jax.random.PRNGKey(seed)
        self._sample = _jax.jit(sample_rows_samp)
        if mesh is None:
            self._pf = _jax.jit(functools.partial(
                self._prefill_impl, cfg=cfg), donate_argnums=(2,))
            self._pfb = _jax.jit(functools.partial(
                self._prefill_batch_impl, cfg=cfg),
                donate_argnums=(2,))
        else:
            from jax.sharding import PartitionSpec as P

            self._pf = _jax.jit(_jax.shard_map(
                functools.partial(self._prefill_impl, cfg=cfg,
                                  axis_name=self._axis),
                mesh=mesh,
                in_specs=(self._pspecs, P(None, None), self._cspec,
                          P()),
                out_specs=(P(None, None, None), self._cspec),
                check_vma=False), donate_argnums=(2,))
            self._pfb = _jax.jit(_jax.shard_map(
                functools.partial(self._prefill_batch_impl, cfg=cfg,
                                  axis_name=self._axis),
                mesh=mesh,
                in_specs=(self._pspecs, P(None, None), self._cspec,
                          P(None), P(None), P(None, None), P(None)),
                out_specs=(P(None), self._cspec),
                check_vma=False), donate_argnums=(2,))

    @staticmethod
    def _prefill_impl(params, ids, scratch, start, cfg,
                      axis_name=None):
        from ..models.llama import prefill

        return prefill(params, ids, scratch, cfg, pos=start,
                       axis_name=axis_name)

    @staticmethod
    def _prefill_batch_impl(params, ids, scratch, starts, plens, samp,
                            key, cfg, axis_name=None):
        """One chunk ROUND for several admissions: prefill every
        scratch row at its own start, sample each row's last valid
        position with its resolved (temperature, top_k, top_p) row."""
        from ..models.llama import prefill
        from .engine import sample_rows_samp

        logits, scratch = prefill(params, ids, scratch, cfg,
                                  pos=starts, axis_name=axis_name)
        logit = jnp.take_along_axis(
            logits, (plens - 1)[:, None, None], axis=1)[:, 0]
        tok = sample_rows_samp(logit, samp, key)
        return tok, scratch

    def submit(self, prompt_ids, max_new_tokens: int = 32,
               eos_id: Optional[int] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None) -> int:
        if len(prompt_ids) + max_new_tokens >= self.max_seq:
            raise ValueError(
                f"request needs {len(prompt_ids)} + {max_new_tokens} "
                f"positions but max_seq is {self.max_seq}")
        # an impossible request must be rejected HERE: admitted, it
        # would head-of-line block the queue forever (the OOM rollback
        # requeues it at the front every step)
        need = -(-(len(prompt_ids) + max_new_tokens) // self.page_size)
        usable = self.alloc.num_usable
        if need > usable:
            raise ValueError(
                f"request needs {need} pages to complete but the pool "
                f"only has {usable} usable pages")
        self._uid += 1
        self.queue.append(self._Request(
            uid=self._uid, prompt_ids=list(map(int, prompt_ids)),
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            temperature=temperature, top_k=top_k, top_p=top_p))
        return self._uid

    def _rtemp(self, r) -> float:
        """A request's resolved temperature (engine default if unset)."""
        if r is None:
            return 0.0
        return self._temp if r.temperature is None else r.temperature

    def _rsamp(self, r):
        """Resolved (temperature, top_k, top_p) against the engine
        defaults (top_k rides a float32 row — exact for any real
        vocab)."""
        if r is None:
            return (0.0, 0.0, 1.0)
        return (self._rtemp(r),
                float(self._top_k if r.top_k is None else r.top_k),
                self._top_p if r.top_p is None else r.top_p)

    def _slot_samp(self):
        """[slots, 3] resolved sampling rows (greedy for empty)."""
        return self._np.asarray([self._rsamp(r) for r in self.active],
                                self._np.float32)

    # -- dispatch builders (single-device jits / tp shard_maps) ----------

    def _mk_scratch(self, rows: int) -> KVCache:
        s = KVCache.create(self.cfg, rows, self.max_seq)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            s = jax.tree.map(
                lambda x, sp: jax.device_put(
                    x, NamedSharding(self.mesh, sp)), s, self._cspec)
        return s

    def _step_fn(self, mp: int):
        """(params, tok [B,1], pages, table, pos) -> (logits, pages)."""
        if self.mesh is None:
            return functools.partial(paged_decode_step, cfg=self.cfg,
                                     max_pages=mp)
        key = ("step", mp)
        fn = self._mesh_fns.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            cfg, axis = self.cfg, self._axis

            def raw(p, tok, pages, table, pos):
                logits, pages = _paged_forward(
                    p, tok, pages, table, pos, cfg, mp, axis_name=axis)
                return logits[:, 0], pages

            fn = jax.jit(jax.shard_map(
                raw, mesh=self.mesh,
                in_specs=(self._pspecs, P(None, None), self._ppspec,
                          P(None, None), P(None)),
                out_specs=(P(None, None), self._ppspec),
                check_vma=False), donate_argnums=(2,))
            self._mesh_fns[key] = fn
        return fn

    def _multi_fn(self, mp: int, n: int):
        """(params, tokens [B], pages, table, pos, samp, key) ->
        (next [B], emitted [B, n], pages)."""
        if self.mesh is None:
            return functools.partial(
                _paged_multi_step, cfg=self.cfg, max_pages=mp, n=n)
        key = ("multi", mp, n)
        fn = self._mesh_fns.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            cfg, axis = self.cfg, self._axis

            def raw(p, tokens, pages, table, pos, samp, k):
                return _paged_multi_impl(p, tokens, pages, table, pos,
                                         samp, k, cfg, mp, n,
                                         axis_name=axis)

            fn = jax.jit(jax.shard_map(
                raw, mesh=self.mesh,
                in_specs=(self._pspecs, P(None), self._ppspec,
                          P(None, None), P(None), P(None, None),
                          P(None)),
                out_specs=(P(None), P(None, None), self._ppspec),
                check_vma=False), donate_argnums=(2,))
            self._mesh_fns[key] = fn
        return fn

    def _spec_fn(self, mp: int):
        """(params, feed, pages, table, pos, draft, samp, key) ->
        (g [B, K], a [B], pages)."""
        if self.mesh is None:
            return functools.partial(_paged_spec_step, cfg=self.cfg,
                                     max_pages=mp)
        key = ("spec", mp)
        fn = self._mesh_fns.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            cfg, axis = self.cfg, self._axis

            def raw(p, feed, pages, table, pos, draft, samp, kk):
                return _paged_spec_impl(p, feed, pages, table, pos,
                                        draft, samp, kk, cfg, mp,
                                        axis_name=axis)

            fn = jax.jit(jax.shard_map(
                raw, mesh=self.mesh,
                in_specs=(self._pspecs, P(None, None), self._ppspec,
                          P(None, None), P(None), P(None, None),
                          P(None, None), P(None)),
                out_specs=(P(None, None), P(None), self._ppspec),
                check_vma=False), donate_argnums=(2,))
            self._mesh_fns[key] = fn
        return fn

    def _spec_multi_fn(self, mp: int, n: int, k: int):
        """(params, pending, pages, table, pos, hist, hcnt, samp, key)
        -> (g [n, B, K], a [n, B], pages)."""
        if self.mesh is None:
            return functools.partial(_paged_spec_multi_step,
                                     cfg=self.cfg, max_pages=mp, n=n,
                                     k=k)
        key = ("specmulti", mp, n, k)
        fn = self._mesh_fns.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            cfg, axis = self.cfg, self._axis

            def raw(p, pend, pages, table, pos, hist, hcnt, samp, kk):
                return _paged_spec_multi_impl(
                    p, pend, pages, table, pos, hist, hcnt, samp, kk,
                    cfg, mp, n, k, axis_name=axis)

            fn = jax.jit(jax.shard_map(
                raw, mesh=self.mesh,
                in_specs=(self._pspecs, P(None), self._ppspec,
                          P(None, None), P(None), P(None, None),
                          P(None), P(None, None), P(None)),
                out_specs=(P(None, None, None), P(None, None),
                           self._ppspec),
                check_vma=False), donate_argnums=(2,))
            self._mesh_fns[key] = fn
        return fn

    def _alloc_pages(self, n: int) -> List[int]:
        """Allocate, evicting prefix-cache pages (LRU, unshared only)
        when the pool is dry."""
        while True:
            try:
                return self.alloc.alloc(n)
            except MemoryError:
                if not self._evict_one():
                    raise

    def _evict_one(self) -> bool:
        if not self._prefix:
            return False
        for k, pg in self._prefix.items():    # oldest first
            if self.alloc.refs(pg) == 1:      # only the cache holds it
                del self._prefix[k]
                self.alloc.free([pg])
                return True
        return False

    def _ensure_pages(self, slot: int, upto: int) -> None:
        """Grow slot's page list to cover positions [0, upto)."""
        need = -(-upto // self.page_size)
        while len(self.owned[slot]) < need:
            pg = self._alloc_pages(1)[0]
            self.table[slot, len(self.owned[slot])] = pg
            self.owned[slot].append(pg)

    def _prefix_lookup(self, r):
        """(cov, shared pages): longest run of FULL prompt pages already
        in the pool, capped at plen-1 so at least one suffix token is
        prefilled (its logits seed the stream)."""
        psz = self.page_size
        plen = len(r.prompt_ids)
        cov, shared = 0, []
        if self._prefix is not None:
            for j in range((plen - 1) // psz):
                k = tuple(r.prompt_ids[:(j + 1) * psz])
                pg = self._prefix.get(k)
                if pg is None:
                    break
                self._prefix.move_to_end(k)   # LRU touch
                shared.append(pg)
                cov = (j + 1) * psz
        return cov, shared

    def _attach_shared(self, slot, shared, scratch, row=0):
        """Point the slot at the shared pages and seed scratch row
        ``row`` with their KV so the suffix prefill attends them."""
        import jax.numpy as _jnp

        psz = self.page_size
        for j, pg in enumerate(shared):
            self.alloc.retain(pg)
            self.table[slot, j] = pg
            self.owned[slot].append(pg)
            scratch = _gather_page(scratch, self.pages,
                                   _jnp.int32(j * psz), _jnp.int32(pg),
                                   _jnp.int32(row))
        return scratch

    def _finish_admit(self, slot, r, tok, n_shared, scratch, row=0):
        """Scatter the suffix pages, register prefix pages, activate."""
        plen = len(r.prompt_ids)
        psz = self.page_size
        self._ensure_pages(slot, plen + 1)
        self.pages = insert_prefill(self.pages, scratch,
                                    self.owned[slot], plen,
                                    start_page=n_shared, row=row)
        if self._prefix is not None:
            # register this prompt's full pages for future sharing
            for j in range(plen // psz):
                k = tuple(r.prompt_ids[:(j + 1) * psz])
                if k not in self._prefix:
                    pg = int(self.table[slot, j])
                    self.alloc.retain(pg)   # cache pin
                    self._prefix[k] = pg
        self.active[slot] = r
        self.pos[slot] = plen
        self._cur[slot] = tok

    def _admit(self) -> None:
        """Admit queued requests into free slots. Groups of up to
        ``admit_width`` prefill BATCHED — one dispatch per chunk round
        across the group's scratch rows (the slot engine's measured
        tunnel-RTT win, here with a row-per-request scratch + per-row
        page scatter). Near the scratch end (garbage rounds write
        [plen, plen+blen)) falls back to per-request admission.

        If the page pool runs dry mid-admission the failed (and any
        not-yet-attempted) requests are rolled back to the queue FRONT
        with their partial page allocations released; they retry as
        live sequences retire. Raises MemoryError only when nothing is
        active anywhere (the request could never be satisfied)."""
        pairs = []
        for slot in range(self.slots):
            if self.active[slot] is not None or not self.queue:
                continue
            pairs.append((slot, self.queue.popleft()))
        if not pairs:
            return
        W = self._admit_width
        failed = []   # (slot, request) rolled back, queue order
        for g in range(0, len(pairs), W):
            group = pairs[g:g + W]
            if failed:                  # pool already dry: don't try
                failed.extend(group)
                continue
            max_blen = self._buckets[-1]
            tight = any(len(r.prompt_ids) + max_blen > self.max_seq
                        for _, r in group)
            short = any(self._pages_short(r, self._prefix_lookup(r)[1])
                        for _, r in group)
            if len(group) == 1 or tight or short:
                for slot, r in group:
                    if failed:
                        failed.append((slot, r))
                        continue
                    try:
                        self._admit_one(slot, r)
                    except MemoryError:
                        self._rollback(slot)
                        failed.append((slot, r))
            else:
                try:
                    self._admit_group(group)
                except _AdmitOOM as e:
                    for slot, r in group[e.row:]:
                        self._rollback(slot)
                        failed.append((slot, r))
        if failed:
            self.queue.extendleft(r for _, r in reversed(failed))
            if not any(r is not None for r in self.active):
                raise MemoryError(
                    "paged KV pool too small for any queued request "
                    f"(free pages {self.alloc.available})")

    def _pages_short(self, r, shared) -> bool:
        """True when the pool cannot currently cover this admission
        (fresh pages needed beyond free + evictable prefix pins) —
        checked BEFORE any prefill dispatch so a doomed admission costs
        no device work (it would otherwise pay the full chunked prefill
        every step until pages free)."""
        need = (-(-(len(r.prompt_ids) + 1) // self.page_size)
                - len(shared))
        evictable = 0
        if self._prefix:
            sh = set(shared)
            evictable = sum(1 for pg in self._prefix.values()
                            if self.alloc.refs(pg) == 1
                            and pg not in sh)
        return need > self.alloc.available + evictable

    def _rollback(self, slot: int) -> None:
        """Undo a partial admission: release every page the slot holds
        (shared-page retains AND fresh allocations — the allocator
        refcounts make one ``free`` per ``owned`` entry exact) and
        clear its block-table row."""
        self.alloc.free(self.owned[slot])
        self.owned[slot] = []
        self.table[slot, :] = 0

    def _admit_one(self, slot, r) -> None:
        import jax as _jax
        import jax.numpy as _jnp

        plen = len(r.prompt_ids)
        cov, shared = self._prefix_lookup(r)
        if self._pages_short(r, shared):
            raise MemoryError(
                f"pool cannot cover admission of uid {r.uid}")
        scratch = self._mk_scratch(1)
        scratch = self._attach_shared(slot, shared, scratch)

        for start, take, blen in iter_prefill_chunks(
                plen - cov, self._buckets, max_len=self.max_seq,
                base=cov):
            ids = self._np.zeros((1, blen), self._np.int32)
            ids[0, :take] = r.prompt_ids[cov + start:
                                         cov + start + take]
            logits, scratch = self._pf(
                self.params, _jnp.asarray(ids), scratch,
                _jnp.int32(cov + start))
        # next token from the LAST VALID position of the final
        # (possibly padded) chunk, sampled with the request's
        # RESOLVED temperature (its first emitted token)
        rsamp = self._np.asarray([self._rsamp(r)], self._np.float32)
        self._key, sub = _jax.random.split(self._key)
        tok = int(self._sample(
            logits[:, take - 1], _jnp.asarray(rsamp), sub)[0])
        self._finish_admit(slot, r, tok, len(shared), scratch)

    def _admit_group(self, group) -> None:
        """Batched admission: one prefill dispatch per chunk round
        across all of ``group``'s scratch rows, assembled by the shared
        :func:`engine.run_chunk_rounds` driver (rows whose request ran
        out of chunks write garbage at [plen, plen+blen) of their OWN
        scratch row — never scattered past plen, never attended)."""
        import jax as _jax
        import jax.numpy as _jnp

        np = self._np
        from .engine import run_chunk_rounds

        W = self._admit_width
        scratch = self._mk_scratch(W)
        n_shared, entries = [], []
        for row, (slot, r) in enumerate(group):
            cov, shared = self._prefix_lookup(r)
            scratch = self._attach_shared(slot, shared, scratch,
                                          row=row)
            n_shared.append(len(shared))
            entries.append((row, r.prompt_ids, cov, iter_prefill_chunks(
                len(r.prompt_ids) - cov, self._buckets,
                max_len=self.max_seq, base=cov)))
        samp = np.zeros((W, 3), np.float32)
        samp[:, 2] = 1.0
        for row, (slot, r) in enumerate(group):
            samp[row] = self._rsamp(r)

        state = {"scratch": scratch}

        def dispatch(ids, starts, plens):
            self._key, sub = _jax.random.split(self._key)
            tok, state["scratch"] = self._pfb(
                self.params, _jnp.asarray(ids), state["scratch"],
                _jnp.asarray(starts), _jnp.asarray(plens),
                _jnp.asarray(samp), sub)
            return np.asarray(tok)

        toks = run_chunk_rounds(entries, W, np.zeros(W, np.int32),
                                dispatch)
        for row, (slot, r) in enumerate(group):
            try:
                self._finish_admit(slot, r, toks[row], n_shared[row],
                                   state["scratch"], row=row)
            except MemoryError:
                raise _AdmitOOM(row) from None

    def step(self) -> int:
        import jax.numpy as _jnp

        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        for i in act:
            self._ensure_pages(i, int(self.pos[i]) + 1)
        live_pages = int(self._np.max((self.pos[act] // self.page_size)
                                      + 1))
        mp = 1
        while mp < live_pages:
            mp *= 2
        mp = min(mp, self.max_pages)
        logits, self.pages = self._step_fn(mp)(
            self.params, _jnp.asarray(self._cur)[:, None], self.pages,
            _jnp.asarray(self.table), _jnp.asarray(self.pos))
        import jax as _jax

        self._key, sub = _jax.random.split(self._key)
        nxt = self._np.asarray(self._sample(
            logits, _jnp.asarray(self._slot_samp()), sub))
        self._steps += 1
        for i in act:
            r = self.active[i]
            r.output_ids.append(int(self._cur[i]))
            if self.on_token is not None:
                self.on_token(r, r.output_ids[-1])
            self.pos[i] += 1
            self._cur[i] = nxt[i]
            full = len(r.output_ids) >= r.max_new_tokens
            hit_eos = (r.eos_id is not None
                       and r.output_ids[-1] == r.eos_id)
            if full or hit_eos or self.pos[i] >= self.max_seq - 1:
                r.done = True
                self.finished[r.uid] = r
                self.active[i] = None
                self.alloc.free(self.owned[i])
                self.owned[i] = []
                self.table[i, :] = 0
        return len(act)

    def step_window(self, n: int) -> int:
        """Run ``n`` decode steps in ONE device dispatch over the paged
        pool (the slot engine's tunnel-RTT amortization, paged):
        admission/retirement happen at window boundaries, so finished
        slots waste at most ``n - 1`` step-slots of throwaway tokens —
        written into their own (still-owned) pages, freed at
        retirement. Near the sequence end falls back to a plain step
        (runs requests to max_seq - 1 token-identically)."""
        import jax as _jax
        import jax.numpy as _jnp

        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        if any(self.pos[i] + n > self.max_seq - 1 for i in act):
            return self.step()
        for i in act:
            self._ensure_pages(i, int(self.pos[i]) + n)
        live_pages = int(self._np.max(
            ((self.pos[act] + n - 1) // self.page_size) + 1))
        mp = 1
        while mp < live_pages:
            mp *= 2
        mp = min(mp, self.max_pages)
        self._key, sub = _jax.random.split(self._key)
        nxt, emitted, self.pages = self._multi_fn(mp, n)(
            self.params, _jnp.asarray(self._cur), self.pages,
            _jnp.asarray(self.table), _jnp.asarray(self.pos),
            _jnp.asarray(self._slot_samp()), sub)
        nxt = self._np.asarray(nxt)
        emitted = self._np.asarray(emitted)    # [slots, n]
        self._steps += n
        for i in act:
            r = self.active[i]
            done = False
            for j in range(n):
                t = int(emitted[i, j])
                r.output_ids.append(t)
                if self.on_token is not None:
                    self.on_token(r, t)
                self.pos[i] += 1
                full = len(r.output_ids) >= r.max_new_tokens
                hit_eos = r.eos_id is not None and t == r.eos_id
                out_of_room = self.pos[i] >= self.max_seq - 1
                if full or hit_eos or out_of_room:
                    r.done = done = True
                    self.finished[r.uid] = r
                    self.active[i] = None
                    self.alloc.free(self.owned[i])
                    self.owned[i] = []
                    self.table[i, :] = 0
                    break
            if not done:
                self._cur[i] = int(nxt[i])
        return len(act)

    def step_spec(self, k: int = 8) -> int:
        """One speculative verify window across the paged pool: each
        slot's pending token + k-1 host-drafted (prompt-lookup) tokens
        go through ONE paged verify forward; accepted tokens commit
        per slot (1..k tokens per dispatch). Greedy slots stream
        token-identically to the plain paged step (tested). Mirrors
        the slot Engine's step_spec over block tables."""
        import jax as _jax
        import jax.numpy as _jnp

        from .engine import draft_lookup_host

        if k > self.page_size:
            raise ValueError(
                f"spec_k {k} exceeds page_size {self.page_size} (the "
                "verify window's slab write spans at most two pages)")
        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        # too close to the sequence end: one plain step (runs requests
        # to max_seq - 1 exactly like the non-speculative engine)
        if any(self.pos[i] + k > self.max_seq - 1 for i in act):
            return self.step()
        for i in act:
            self._ensure_pages(i, int(self.pos[i]) + k)
        feed = self._np.zeros((self.slots, k), self._np.int32)
        draft = self._np.zeros((self.slots, k), self._np.int32)
        for i in act:
            r = self.active[i]
            hist = r.prompt_ids + r.output_ids + [int(self._cur[i])]
            d = self.draft_fn(hist, k)
            draft[i] = d
            feed[i, 0] = self._cur[i]
            feed[i, 1:] = d[:k - 1]
        live_pages = int(self._np.max(
            ((self.pos[act] + k - 1) // self.page_size) + 1))
        mp = 1
        while mp < live_pages:
            mp *= 2
        mp = min(mp, self.max_pages)
        self._key, sub = _jax.random.split(self._key)
        g, a, self.pages = self._spec_fn(mp)(
            self.params, _jnp.asarray(feed), self.pages,
            _jnp.asarray(self.table), _jnp.asarray(self.pos),
            _jnp.asarray(draft),
            _jnp.asarray(self._slot_samp()), sub)
        g = self._np.asarray(g)
        a = self._np.asarray(a)
        self._steps += 1
        self._spec_windows += 1
        self._spec_drafted += (k - 1) * len(act)
        self._spec_accepted += int(sum(min(int(a[i]), k - 1) for i in act))
        for i in act:
            r = self.active[i]
            toks = [int(self._cur[i])] + [int(t) for t in
                                          g[i, :int(a[i])]]
            done = False
            for t in toks:
                r.output_ids.append(t)
                if self.on_token is not None:
                    self.on_token(r, t)
                self.pos[i] += 1
                full = len(r.output_ids) >= r.max_new_tokens
                hit_eos = r.eos_id is not None and t == r.eos_id
                out_of_room = self.pos[i] >= self.max_seq - 1
                if full or hit_eos or out_of_room:
                    r.done = done = True
                    self.finished[r.uid] = r
                    self.active[i] = None
                    self.alloc.free(self.owned[i])
                    self.owned[i] = []
                    self.table[i, :] = 0
                    break
            if not done:
                self._cur[i] = int(g[i, int(a[i])])
        return len(act)

    def step_spec_multi(self, k: int, n: int) -> int:
        """``n`` speculative verify windows in ONE dispatch (the
        spec_k x steps_per_dispatch composition): on-device drafting
        chains the windows without host round trips; the host walks
        the emitted windows afterwards. Emits 1..n*k tokens per slot
        per dispatch. Near the sequence end falls back to the
        single-window path (which itself falls back to a plain step),
        so streams run to max_seq - 1 token-identically."""
        import jax as _jax
        import jax.numpy as _jnp

        if k > self.page_size:
            raise ValueError(
                f"spec_k {k} exceeds page_size {self.page_size} (the "
                "verify window's slab write spans at most two pages)")
        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        if any(self.pos[i] + n * k > self.max_seq - 1 for i in act):
            return self.step_spec(k)
        for i in act:
            self._ensure_pages(i, int(self.pos[i]) + n * k)
        np = self._np
        H = self.max_seq + k + 2
        hist = np.zeros((self.slots, H), np.int32)
        hcnt = np.full(self.slots, 2, np.int32)
        pending = np.zeros(self.slots, np.int32)
        for i in act:
            r = self.active[i]
            h = r.prompt_ids + r.output_ids + [int(self._cur[i])]
            hist[i, :len(h)] = h
            hcnt[i] = len(h)
            pending[i] = self._cur[i]
        live_pages = int(np.max(
            ((self.pos[act] + n * k - 1) // self.page_size) + 1))
        mp = 1
        while mp < live_pages:
            mp *= 2
        mp = min(mp, self.max_pages)
        self._key, sub = _jax.random.split(self._key)
        gs, accs, self.pages = self._spec_multi_fn(mp, n, k)(
            self.params, _jnp.asarray(pending), self.pages,
            _jnp.asarray(self.table), _jnp.asarray(self.pos),
            _jnp.asarray(hist), _jnp.asarray(hcnt),
            _jnp.asarray(self._slot_samp()), sub)
        gs = np.asarray(gs)           # [n, slots, k]
        accs = np.asarray(accs)       # [n, slots]
        self._steps += n
        self._spec_windows += n
        for i in act:
            r = self.active[i]
            cur = int(self._cur[i])
            done = False
            for j in range(n):
                # Drafted is counted per WALKED window (not n*len(act)
                # up front): a slot that finishes mid-dispatch stops
                # consuming windows, and counting its unwalked windows
                # as drafted-with-zero-accepted would understate
                # spec_accept_rate on workloads with mid-window
                # EOS/length finishes (advisor r4). Accepted below is
                # on the same window set.
                self._spec_drafted += k - 1
                a = int(accs[j, i])
                self._spec_accepted += min(a, k - 1)
                for t in [cur] + [int(t) for t in gs[j, i, :a]]:
                    r.output_ids.append(t)
                    if self.on_token is not None:
                        self.on_token(r, t)
                    self.pos[i] += 1
                    full = len(r.output_ids) >= r.max_new_tokens
                    hit_eos = r.eos_id is not None and t == r.eos_id
                    out_of_room = self.pos[i] >= self.max_seq - 1
                    if full or hit_eos or out_of_room:
                        r.done = done = True
                        self.finished[r.uid] = r
                        self.active[i] = None
                        self.alloc.free(self.owned[i])
                        self.owned[i] = []
                        self.table[i, :] = 0
                        break
                if done:
                    break
                cur = int(gs[j, i, a])
            if not done:
                self._cur[i] = cur
        return len(act)

    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None
                                       for r in self.active)

    def stats(self) -> dict:
        """Live engine counters (Engine.stats contract) + page-pool
        occupancy — the paged engine's reason to exist is that memory
        tracks LIVE tokens, so the pool numbers are the headline."""
        live = sum(1 for r in self.active if r is not None)
        return {
            "steps": self._steps,
            "spec_windows": self._spec_windows,
            "spec_drafted": self._spec_drafted,
            "spec_accepted": self._spec_accepted,
            "spec_accept_rate": (self._spec_accepted / self._spec_drafted
                                 if self._spec_drafted else 0.0),
            "active_slots": live,
            "queued": len(self.queue),
            "finished": len(self.finished),
            "emitted_tokens": sum(len(r.output_ids)
                                  for r in self.finished.values())
            + sum(len(r.output_ids) for r in self.active
                  if r is not None),
            "pages_total": self.pages.num_pages,
            "pages_free": self.alloc.available,
            "prefix_cache_pages": (0 if self._prefix is None
                                   else len(self._prefix)),
            "live_tokens": int(self.pos[[i for i, r in
                                         enumerate(self.active)
                                         if r is not None]].sum())
            if live else 0,
        }

    def recover(self) -> int:
        """Failure recovery (Engine.recover contract over the paged
        pool): requeue every in-flight request with its prompt extended
        by the tokens already generated, release ALL pages, reset the
        allocator/tables/prefix-cache, and zero the pool (a device
        error leaves its contents untrusted). Greedy re-admission
        reproduces the exact continuation — the watchdog re-dispatch
        invariant. Returns #requests requeued."""
        n = 0
        for i, r in enumerate(self.active):
            if r is None:
                continue
            r.prompt_ids = r.prompt_ids + r.output_ids
            self.queue.appendleft(r)
            self.active[i] = None
            n += 1
        for i in range(self.slots):
            self.owned[i] = []
        self.table[:, :] = 0
        self.pos[:] = 0
        self._cur[:] = 0
        self.alloc = PageAllocator(self.pages.num_pages)
        if self._prefix is not None:
            self._prefix.clear()
        import jax as _jax

        self.pages = _jax.tree.map(jnp.zeros_like, self.pages)
        return n

    def run(self, max_steps: int = 100000, spec_k: int = 0,
            steps_per_dispatch: int = 1):
        """Drive to completion. ``spec_k`` and ``steps_per_dispatch``
        COMPOSE: spec_k=8, steps_per_dispatch=4 runs 4 speculative
        verify windows per device dispatch (on-device drafting chains
        them), emitting up to 32 tokens per slot per round trip."""
        steps = 0
        while (self.queue or any(self.active)) and steps < max_steps:
            if spec_k > 0 and steps_per_dispatch > 1:
                self.step_spec_multi(spec_k, steps_per_dispatch)
            elif spec_k > 0:
                self.step_spec(spec_k)
            elif steps_per_dispatch > 1:
                self.step_window(steps_per_dispatch)
            else:
                self.step()
            steps += 1
        return self.finished
