"""Ring attention — sequence-parallel (SP/CP) causal attention.

Closes the one "partial" row of SURVEY.md §2.3: the reference has no
attention code at all (attention came from HF transformers;
modules.py:67 replaces only Linear layers), and long-context sequence
parallelism was marked an optional extension.  This is the TPU-native
design: the sequence axis is sharded over a mesh axis, each device
holds one contiguous chunk of Q/K/V, and K/V chunks rotate around the
ring via ``ppermute`` while every device accumulates its queries'
attention over each visiting chunk with an online softmax (the
flash-attention recurrence).  XLA overlaps the ``ppermute`` (ICI) with
the local attention compute of the chunk already on hand — the same
collective/compute overlap story as the TP row, riding the ring.

Memory per device is O(T/n · T/n) per block instead of O(T²): a 128k
context over an 8-device v5e slice attends in 16k-token chunks.

Causality across chunks is resolved at CHUNK granularity: a visiting
K/V chunk strictly in the past is attended in full (no mask), the
device's own chunk uses the triangular mask, and strictly-future
chunks contribute nothing (their scores are masked to -inf; the ring
still forwards them — uniform schedule keeps every ppermute tick
identical, which is what lets XLA pipeline it).

All accumulation is fp32; the output matches dense causal attention up
to fp32 summation reordering (CPU mesh sim test: ≤1 ULP at bf16 output
rounding, <0.1% of elements affected).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "make_ring_attention_fn",
           "make_sp_prefill_fn"]

_NEG = -1e30


def ring_attention(
    q: jnp.ndarray,      # [B, C, KVH, G, D] local query chunk
    k: jnp.ndarray,      # [B, C, KVH, D] local key chunk
    v: jnp.ndarray,      # [B, C, KVH, D] local value chunk
    axis_name: str,
    num_devices: int,
    sliding_window: Optional[int] = None,
    use_window: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
) -> jnp.ndarray:
    """Causal ring attention over a sequence-sharded axis. Must be
    called inside ``shard_map`` with the sequence dim sharded over
    ``axis_name``; device ``d`` owns global positions
    ``[d*C, (d+1)*C)``. ``sliding_window`` applies the Mistral-style
    window (attend iff ``0 <= q_pos - k_pos < window``);
    ``use_window`` (traced bool) toggles it per call — the Gemma-2
    per-layer alternation under ``lax.scan``. ``scale`` overrides the
    default ``D**-0.5`` score scale; ``logit_softcap`` applies the
    Gemma-2 ``cap*tanh(s/cap)``. Returns fp32 ``[B, C, KVH, G, D]``."""
    B, C, KVH, G, D = q.shape
    scale = (D ** -0.5) if scale is None else scale
    d_idx = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32) * scale
    # global position grids: the mask is a pure function of
    # q_pos - k_pos, which covers causal, own-chunk triangular and
    # sliding-window cases uniformly (the visiting chunk's base offset
    # shifts k_pos per ring step)
    qpos = d_idx * C + jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    kloc = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)

    m = jnp.full((B, C, KVH, G), _NEG, jnp.float32)
    l = jnp.zeros((B, C, KVH, G), jnp.float32)
    acc = jnp.zeros((B, C, KVH, G, D), jnp.float32)
    perm = [(i, (i + 1) % num_devices) for i in range(num_devices)]

    kv = (k, v)
    for s in range(num_devices):
        kc, vc = kv
        src = jax.lax.rem(d_idx - s + num_devices, num_devices)
        sc = jnp.einsum(
            "bqkgd,bskd->bqkgs", qf, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32)          # [B,C,KVH,G,C]
        if logit_softcap is not None:
            sc = logit_softcap * jnp.tanh(sc / logit_softcap)
        diff = qpos - (src * C + kloc)                   # [C, C]
        vis = diff >= 0
        if sliding_window is not None:
            win = vis & (diff < sliding_window)
            vis = (win if use_window is None
                   else jnp.where(use_window, win, vis))
        sc = jnp.where(vis[None, :, None, None, :], sc, _NEG)

        m_new = jnp.maximum(m, jnp.max(sc, axis=-1))
        p = jnp.exp(sc - m_new[..., None])
        # a fully-masked row (future chunk) exponentiates _NEG - m: 0
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bqkgs,bskd->bqkgd", p, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        m = m_new
        if s + 1 < num_devices:
            kv = jax.lax.ppermute(kv, axis_name, perm)

    return acc / l[..., None]


def make_sp_prefill_fn(mesh: Mesh, cfg, axis_name: str = "sp",
                       tp_axis: Optional[str] = None):
    """Sequence-parallel long-context prefill: the PROMPT axis is
    sharded over ``axis_name``. Each device embeds and projects its own
    token chunk (QKV/MLP are token-parallel — a quantized linear is
    independent per row), attention runs as :func:`ring_attention`, and
    the per-chunk K/V land in the standard :class:`KVCache` layout
    (out_specs shard the cache's sequence axis, so the gather is just
    the shard_map output). Decode then proceeds on the filled cache
    exactly as after a single-device prefill.

    ``tp_axis`` composes with tensor parallelism on a 2D
    ``(sp, tp)`` mesh: params are the standard TP shards
    (:func:`..parallel.shard.shard_llama_params` on the 2D mesh —
    column/row-parallel weights, psum over tp inside each token chunk,
    kv heads sharded over tp in the output cache), so rings ride one
    ICI axis while TP reductions ride the other.

    This is what makes 100k+-token prompts fit: activations and the
    O(C²) attention score block scale with the 1/n chunk, not the full
    prompt (a 128k Llama3-8B prefill's scores alone are 64 GB dense).

    Returns ``f(params, token_ids [B, T], cache) -> (last-token logits
    [B, vocab], cache)``; T must divide by the mesh axis size.
    Mistral-style ``cfg.sliding_window`` is honored (the ring mask is a
    pure function of the global position difference)."""
    from ..models.llama import (KVCache, QLinear, _act, _norm, _ql,
                                _ql_psum, apply_rope, embed_lookup,
                                layer_window, quantize_kv_i8, rms_norm,
                                rope_cos_sin)

    int8_kv = cfg.kv_cache_dtype == "int8"
    if tp_axis is not None:
        if tp_axis != "tp":
            # llama_param_pspecs hardcodes the mesh axis name "tp"
            # (shard.AXIS); an arbitrary name would make the param
            # in_specs and kv out_specs disagree
            raise ValueError("tp_axis must be the mesh axis named 'tp'")
        from .shard import validate_tp

        validate_tp(cfg, mesh.shape[tp_axis])
    n = mesh.shape[axis_name]
    qcfg = cfg.quant
    D = cfg.head_dim

    def trunk(params, tokens):           # local chunk: tokens [B, C]
        B, C = tokens.shape
        d = jax.lax.axis_index(axis_name)
        positions = jnp.broadcast_to(
            (d * C + jnp.arange(C, dtype=jnp.int32))[None, :], (B, C))
        cos, sin = rope_cos_sin(positions, D, cfg.rope_theta,
                                cfg.rope_scaling)
        x = embed_lookup(params.embed, tokens, qcfg.quant_type)
        if cfg.embed_normalizer:
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
        stacked = params.layers

        def body(x, i):
            xa = _norm(x, stacked.attn_norm[i], cfg)
            x2 = xa.astype(qcfg.compute_dtype).reshape(B * C, -1)
            q = _ql(x2, stacked.q, qcfg, i)
            k = _ql(x2, stacked.k, qcfg, i)
            v = _ql(x2, stacked.v, qcfg, i)
            if stacked.q_bias is not None:
                q = q + stacked.q_bias[i].astype(q.dtype)
                k = k + stacked.k_bias[i].astype(k.dtype)
                v = v + stacked.v_bias[i].astype(v.dtype)
            n_q, n_kv = q.shape[-1] // D, k.shape[-1] // D  # per tp shard
            q = q.reshape(B, C, n_q, D)
            k = k.reshape(B, C, n_kv, D)
            if stacked.q_norm is not None:
                q = rms_norm(q, stacked.q_norm[i], cfg.rms_norm_eps)
                k = rms_norm(k, stacked.k_norm[i], cfg.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            v = v.reshape(B, C, n_kv, D)
            if int8_kv:
                # quantize-on-write EXACTLY like the dense int8 path,
                # then attend the dequantized values — the ring must
                # see the same K/V the dense prefill reads back from
                # its cache, or streams diverge from the single-device
                # int8 reference
                kq, kstep = quantize_kv_i8(k.swapaxes(1, 2))
                vq, vstep = quantize_kv_i8(v.swapaxes(1, 2))
                k = (kq.astype(jnp.float32)
                     * kstep[..., None].astype(jnp.float32)
                     ).swapaxes(1, 2)
                v = (vq.astype(jnp.float32)
                     * vstep[..., None].astype(jnp.float32)
                     ).swapaxes(1, 2)
            use_win, _ = layer_window(cfg, i)
            attn = ring_attention(
                q.reshape(B, C, n_kv, n_q // n_kv, D), k, v,
                axis_name, n, sliding_window=cfg.sliding_window,
                use_window=use_win,
                scale=(None if cfg.query_scale is None
                       else cfg.query_scale ** -0.5),
                logit_softcap=cfg.attn_logit_softcap)
            o = _ql_psum(
                attn.reshape(B * C, n_q * D).astype(qcfg.compute_dtype),
                stacked.o, qcfg, i, tp_axis, cfg.tp_overlap_chunks)
            ob = o.reshape(B, C, -1)
            if stacked.post_attn_norm is not None:
                ob = _norm(ob, stacked.post_attn_norm[i], cfg)
            x = x + ob.astype(x.dtype)

            xm = _norm(x, stacked.mlp_norm[i], cfg)
            x2 = xm.astype(qcfg.compute_dtype).reshape(B * C, -1)
            g = _ql(x2, stacked.gate, qcfg, i)
            u = _ql(x2, stacked.up, qcfg, i)
            dn = _ql_psum((_act(g, cfg) * u).astype(qcfg.compute_dtype),
                          stacked.down, qcfg, i, tp_axis,
                          cfg.tp_overlap_chunks)
            db = dn.reshape(B, C, -1)
            if stacked.post_mlp_norm is not None:
                db = _norm(db, stacked.post_mlp_norm[i], cfg)
            x = x + db.astype(x.dtype)
            # cache-native chunk [B, KV(shard), C, D]
            if int8_kv:
                return x, (kq, vq, kstep, vstep)
            return x, (k.swapaxes(1, 2).astype(jnp.bfloat16),
                       v.swapaxes(1, 2).astype(jnp.bfloat16),
                       jnp.zeros((), jnp.bfloat16),
                       jnp.zeros((), jnp.bfloat16))

        idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
        # ks [L, B, KV, C, D]; int8 adds step planes [L, B, KV, C]
        x, (ks, vs, kst, vst) = jax.lax.scan(body, x, idx)

        # lm_head on the global last token (it lives on sp rank n-1)
        xl = jax.lax.all_gather(x[:, -1, :], axis_name)[-1]    # [B, h]
        xl = _norm(xl, params.final_norm, cfg)
        if isinstance(params.lm_head, QLinear):
            logits = _ql(xl.astype(qcfg.compute_dtype), params.lm_head,
                         qcfg)
        else:
            logits = jnp.einsum(
                "bh,vh->bv", xl.astype(jnp.bfloat16), params.lm_head,
                preferred_element_type=jnp.float32)
        if cfg.final_logit_softcap is not None:
            cap = cfg.final_logit_softcap
            logits = cap * jnp.tanh(logits / cap)
        if tp_axis is not None:   # vocab-sharded head: gather the shards
            logits = jax.lax.all_gather(logits, tp_axis, axis=-1,
                                        tiled=True)
        return logits, ks, vs, kst, vst

    if tp_axis is None:
        def pspecs(params):
            return jax.tree.map(lambda _: P(), params)
        kv_spec = P(None, None, None, axis_name)
        st_spec = P(None, None, None, axis_name) if int8_kv else P()
    else:
        from .shard import llama_param_pspecs

        def pspecs(params):
            return llama_param_pspecs(cfg)
        kv_spec = P(None, None, tp_axis, axis_name)
        st_spec = P(None, None, tp_axis, axis_name) if int8_kv else P()

    @jax.jit
    def f(params, token_ids, cache):
        if tp_axis is not None and (params.layers.o.layout == "pair"
                                    or params.layers.down.layout == "pair"):
            raise ValueError(
                "row-parallel o/down must be planar under tp (the pair "
                "layout's word axis does not slice congruently with K) "
                "— place params with parallel.shard_llama_params")
        logits, ks, vs, kst, vst = jax.shard_map(
            trunk, mesh=mesh,
            in_specs=(pspecs(params), P(None, axis_name)),
            out_specs=(P(None, None), kv_spec, kv_spec, st_spec,
                       st_spec),
            check_vma=False,
        )(params, token_ids)
        zero = (0,) * 5
        ck = jax.lax.dynamic_update_slice(
            cache.k, ks.astype(cache.k.dtype), zero)
        cv = jax.lax.dynamic_update_slice(
            cache.v, vs.astype(cache.v.dtype), zero)
        if int8_kv:
            cks = jax.lax.dynamic_update_slice(
                cache.k_scale, kst.astype(cache.k_scale.dtype),
                zero[:4])
            cvs = jax.lax.dynamic_update_slice(
                cache.v_scale, vst.astype(cache.v_scale.dtype),
                zero[:4])
            return logits, KVCache(k=ck, v=cv, k_scale=cks,
                                   v_scale=cvs)
        return logits, KVCache(k=ck, v=cv)

    return f


def make_ring_attention_fn(
    mesh: Mesh,
    axis_name: str = "sp",
):
    """jit-ready sequence-parallel attention over ``mesh``: global
    ``q [B, T, KVH, G, D]`` / ``k,v [B, T, KVH, D]`` sharded on T,
    output gathered back. Standalone entry for testing and for model
    integrations that manage their own sequence sharding."""
    n = mesh.shape[axis_name]

    @jax.jit
    def f(q, k, v):
        fn = jax.shard_map(
            functools.partial(ring_attention, axis_name=axis_name,
                              num_devices=n),
            mesh=mesh,
            in_specs=(P(None, axis_name), P(None, axis_name),
                      P(None, axis_name)),
            out_specs=P(None, axis_name),
        )
        return fn(q, k, v)

    return f
