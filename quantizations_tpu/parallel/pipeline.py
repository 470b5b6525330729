"""Pipeline parallelism (inference, GPipe-style microbatching).

SURVEY.md §2.3: stage-sharding is the optional second axis (TP over ICI
is primary; PP suits DCN across hosts, where each host holds 1/n of the
layers). Design:

- The stacked layer pytree ``[L, ...]`` is sharded on the LAYER axis
  over the "pp" mesh axis — stage s owns layers ``[s*L/n, (s+1)*L/n)``
  and the matching KV-cache slice. Embedding / final norm / lm_head are
  replicated (they are small next to the transformer stack).
- A forward processes ``n_pp`` microbatches through a ``2*n_pp - 1``
  tick schedule: at tick t, stage s works on microbatch ``t - s`` and
  hands its activation to stage s+1 via ``ppermute``. Every stage
  executes every tick (SPMD), so inactive ticks compute on garbage —
  harmless EXCEPT for KV-cache writes, which are redirected to a
  reserved scratch position (``max_seq - 1``); the attention mask never
  reads past ``pos``, so the trash is invisible. Effective max_seq under
  PP is therefore ``max_seq - 1``.
- Logits are produced on the LAST stage and made replicated with a
  ``psum`` (other stages contribute zeros).

Composable with the generate loop: ``make_pp_generate_fn`` mirrors
``make_sharded_generate_fn`` but over a ("pp",) mesh.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ServeConfig
from ..models.llama import (
    KVCache,
    embed_lookup,
    LlamaConfig,
    LlamaLayer,
    LlamaParams,
    QLinear,
    _layer_forward,
    _norm,
    layer_window,
    rope_cos_sin,
)
from ..serve.generate import sample_logits

__all__ = [
    "PP_AXIS",
    "pp_param_pspecs",
    "pp_cache_pspec",
    "shard_llama_params_pp",
    "make_pp_generate_fn",
]

PP_AXIS = "pp"


def pp_param_pspecs(cfg: LlamaConfig,
                    tp_axis: Optional[str] = None) -> LlamaParams:
    """Stage-sharded specs; with ``tp_axis`` each stage's layer slice is
    additionally Megatron-sharded (column-parallel q/k/v/gate/up rows,
    row-parallel o/down packed-K) — the 2D pp×tp layout."""
    col = QLinear(wp=P(PP_AXIS, tp_axis, None),
                  scales=P(PP_AXIS, tp_axis, None))
    row = QLinear(wp=P(PP_AXIS, None, tp_axis),
                  scales=P(PP_AXIS, None, tp_axis))
    ab = P(PP_AXIS, tp_axis) if cfg.attention_bias else None
    pn = P(PP_AXIS, None) if cfg.post_norms else None   # Gemma-2 sandwich
    qn = P(PP_AXIS, None) if cfg.qk_norm else None      # Qwen3 [head_dim]
    layer = LlamaLayer(
        attn_norm=P(PP_AXIS, None),
        q=col, k=col, v=col, o=row,
        mlp_norm=P(PP_AXIS, None),
        gate=col, up=col, down=row,
        q_bias=ab, k_bias=ab, v_bias=ab,
        post_attn_norm=pn, post_mlp_norm=pn, q_norm=qn, k_norm=qn,
    )
    lm_head = (QLinear(wp=P(tp_axis, None), scales=P(tp_axis, None))
               if cfg.quant.quantize_lm_head else P(tp_axis, None))
    embed = (QLinear(wp=P(None, None), scales=P(None, None))
             if cfg.quant.quantize_embedding else P(None, None))
    return LlamaParams(embed=embed, layers=layer,
                       final_norm=P(None), lm_head=lm_head)


def pp_cache_pspec(tp_axis: Optional[str] = None,
                   cfg: Optional[LlamaConfig] = None) -> KVCache:
    """[L, B, KV, S, D] — shard layers (and kv heads under pp×tp).
    With an int8 ``cfg`` the dequant-step planes [L, B, KV, S] shard on
    the same layer (and kv) axes as the code planes."""
    kv = P(PP_AXIS, None, tp_axis, None, None)
    if cfg is not None and cfg.kv_cache_dtype == "int8":
        sc = P(PP_AXIS, None, tp_axis, None)
        return KVCache(k=kv, v=kv, k_scale=sc, v_scale=sc)
    return KVCache(k=kv, v=kv)


def shard_llama_params_pp(params: LlamaParams, mesh: Mesh,
                          cfg: LlamaConfig,
                          tp_axis: Optional[str] = None) -> LlamaParams:
    n = mesh.shape[PP_AXIS]
    if cfg.num_hidden_layers % n:
        raise ValueError(
            f"layers {cfg.num_hidden_layers} % pp {n} != 0")
    if params.layers.qkv is not None:
        raise ValueError(
            "fused params: PP slices the UNFUSED per-projection form")
    if tp_axis is not None:
        from .shard import _ensure_planar, validate_tp

        validate_tp(cfg, mesh.shape[tp_axis])
        layers = params.layers
        params = params.replace(layers=layers.replace(
            o=_ensure_planar(layers.o), down=_ensure_planar(layers.down)))
    specs = pp_param_pspecs(cfg, tp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def _stage_forward(params, x, ck, cv, pos, cos, sin, mask, cfg,
                   attend_len, tp_axis=None, stage=None, mask_full=None,
                   cks=None, cvs=None):
    """Run THIS stage's local layer slice (a python loop over the local
    stacked leaves — per-stage layer count is static). ``stage`` (the
    traced pp coordinate) recovers each layer's GLOBAL index for the
    Gemma-2 per-layer window alternation; ``mask_full`` is the
    unwindowed causal mask selected on global-attention layers."""
    stacked = params.layers
    L_local = stacked.attn_norm.shape[0]
    for i in range(L_local):
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
        )
        # alternation follows the GLOBAL layer index across stages
        gi = (jnp.int32(0) if stage is None else stage) * L_local + i
        use_win, win_eff = layer_window(cfg, gi)
        mask_i = (mask if use_win is None
                  else jnp.where(use_win, mask, mask_full))
        out = _layer_forward(
            x, layer, ck, cv, pos, cos, sin, mask_i, cfg,
            axis_name=tp_axis, idx=jnp.int32(i), attend_len=attend_len,
            cks=cks, cvs=cvs, win_eff=win_eff)
        if cks is not None:
            x, ck, cv, cks, cvs = out
        else:
            x, ck, cv = out
    return x, ck, cv, cks, cvs


def _pp_forward(
    params: LlamaParams,      # per-stage shards (layers/cache local)
    token_ids: jnp.ndarray,   # [B, T] replicated; B % n_pp == 0
    cache: KVCache,           # local [L/n, B, KV, S, D]
    pos: jnp.ndarray,         # [B]
    cfg: LlamaConfig,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Microbatched pipeline forward; returns last-token logits [B, vocab]
    (replicated) and the updated local cache."""
    n_pp = jax.lax.psum(1, PP_AXIS)
    stage = jax.lax.axis_index(PP_AXIS)
    B, T = token_ids.shape
    mb = B // n_pp
    S = cache.max_seq
    h = cfg.hidden_size

    pos = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(pos, jnp.int32)),
                           (B,))
    tokens_mb = token_ids.reshape(n_pp, mb, T)
    pos_mb = pos.reshape(n_pp, mb)

    ck, cv = cache.k, cache.v
    cks, cvs = cache.k_scale, cache.v_scale
    buf = jnp.zeros((mb, T, h), jnp.bfloat16)
    logits_acc = jnp.zeros((n_pp, mb, cfg.vocab_size), jnp.float32)

    fwd_perm = [(i, (i + 1) % n_pp) for i in range(n_pp)]

    for t in range(2 * n_pp - 1):
        mb_idx = t - stage                     # traced (stage is traced)
        active = (mb_idx >= 0) & (mb_idx < n_pp)
        safe_idx = jnp.clip(mb_idx, 0, n_pp - 1)
        toks_t = tokens_mb[safe_idx]           # [mb, T]
        pos_t = jnp.where(active, pos_mb[safe_idx], 0)

        # stage 0 ingests fresh tokens; other stages consume the buffer
        x_embed = embed_lookup(params.embed, toks_t, cfg.quant.quant_type)
        if cfg.embed_normalizer:
            x_embed = x_embed * jnp.asarray(cfg.hidden_size ** 0.5,
                                            x_embed.dtype)
        x = jnp.where(stage == 0, x_embed, buf)

        positions = pos_t[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                                cfg.rope_scaling)
        key_pos = jnp.arange(S, dtype=jnp.int32)
        mask_full = key_pos[None, None, :] <= positions[:, :, None]
        mask = mask_full
        if cfg.sliding_window is not None:
            mask = mask & (key_pos[None, None, :]
                           > positions[:, :, None] - cfg.sliding_window)

        # inactive ticks write their (garbage) k/v to the reserved
        # scratch position S-1-T+1 .. S-1, never read by the mask
        pos_write = jnp.where(active, pos_t, S - T)

        # local cache slots of this microbatch
        ck_mb = jax.lax.dynamic_slice_in_dim(ck, safe_idx * mb, mb, 1)
        cv_mb = jax.lax.dynamic_slice_in_dim(cv, safe_idx * mb, mb, 1)
        cks_mb = cvs_mb = None
        if cks is not None:
            cks_mb = jax.lax.dynamic_slice_in_dim(cks, safe_idx * mb,
                                                  mb, 1)
            cvs_mb = jax.lax.dynamic_slice_in_dim(cvs, safe_idx * mb,
                                                  mb, 1)
        x, ck_mb, cv_mb, cks_mb, cvs_mb = _stage_forward(
            params, x, ck_mb, cv_mb, pos_write, cos, sin, mask, cfg,
            attend_len=None, tp_axis=tp_axis, stage=stage,
            mask_full=mask_full, cks=cks_mb, cvs=cvs_mb)
        write_at = jnp.where(active, safe_idx * mb, 0)

        def _wb(full, mbv):
            return jax.lax.dynamic_update_slice_in_dim(
                full,
                jnp.where(active, mbv, jax.lax.dynamic_slice_in_dim(
                    full, write_at, mb, 1)),
                write_at, 1)

        ck = _wb(ck, ck_mb)
        cv = _wb(cv, cv_mb)
        if cks is not None:
            cks = _wb(cks, cks_mb)
            cvs = _wb(cvs, cvs_mb)

        # last stage: last-token logits for this microbatch
        xl = _norm(x[:, -1:, :], params.final_norm, cfg)
        if isinstance(params.lm_head, QLinear):
            from ..nn.linear import apply_4bit

            lg = apply_4bit(
                xl.astype(cfg.quant.compute_dtype).reshape(mb, h),
                params.lm_head.wp, params.lm_head.scales,
                cfg.quant.quant_type,
                compute_dtype=cfg.quant.compute_dtype,
                pair_pipeline=cfg.quant.pair_pipeline,
                fp4_decode=cfg.quant.pair_decode)
        else:
            lg = jnp.einsum("mh,vh->mv", xl.reshape(mb, h).astype(
                jnp.bfloat16), params.lm_head,
                preferred_element_type=jnp.float32)
        if tp_axis is not None:   # vocab-sharded head: gather over tp
            lg = jax.lax.all_gather(lg, tp_axis, axis=-1, tiled=True)
        if cfg.final_logit_softcap is not None:
            cap = cfg.final_logit_softcap
            lg = cap * jnp.tanh(lg / cap)
        is_last = stage == n_pp - 1
        contrib = jnp.where(active & is_last, lg, 0.0)
        logits_acc = jax.lax.dynamic_update_slice_in_dim(
            logits_acc,
            (jax.lax.dynamic_slice_in_dim(logits_acc, safe_idx, 1, 0)[0]
             + contrib)[None],
            safe_idx, 0)

        # hand activations to the next stage
        buf = jax.lax.ppermute(x.astype(jnp.bfloat16), PP_AXIS, fwd_perm)

    # every stage contributed zeros except the last: replicate via psum
    logits = jax.lax.psum(logits_acc, PP_AXIS).reshape(B, cfg.vocab_size)
    return logits, KVCache(k=ck, v=cv, k_scale=cks, v_scale=cvs)


def make_pp_generate_fn(cfg: LlamaConfig, serve: ServeConfig,
                        mesh: Mesh,
                        tp_axis: Optional[str] = None) -> Callable:
    """Pipeline-parallel generate: ``(params, prompt_ids, cache, key) ->
    (tokens, cache)``. ``B % n_pp == 0``; effective max_seq is
    ``serve.max_seq_len - 1`` (one reserved scratch slot). ``tp_axis``
    composes with tensor parallelism on a 2D (pp, tp) mesh: each stage's
    layer slice is Megatron-sharded, psums ride the tp axis while stage
    handoffs ppermute on pp (int8 caches thread their dequant-step
    planes through the same microbatch slices)."""
    n_pp = mesh.shape[PP_AXIS]

    def body(params, prompt_ids, cache, key):
        B, Ptok = prompt_ids.shape
        logits, cache = _pp_forward(params, prompt_ids, cache,
                                    jnp.zeros((B,), jnp.int32), cfg,
                                    tp_axis=tp_axis)
        key, sub = jax.random.split(key)
        tok = sample_logits(logits, sub, serve.temperature, serve.top_k)

        def step(carry, _):
            tok, cache, p, key = carry
            logits, cache = _pp_forward(
                params, tok[:, None], cache,
                jnp.full((B,), p, jnp.int32), cfg, tp_axis=tp_axis)
            key, sub = jax.random.split(key)
            nxt = sample_logits(logits, sub, serve.temperature,
                                serve.top_k)
            return (nxt, cache, p + 1, key), nxt

        (_, cache, _, _), toks = jax.lax.scan(
            step, (tok, cache, jnp.int32(Ptok), key), None,
            length=serve.max_new_tokens - 1)
        tokens = jnp.concatenate(
            [tok[:, None], toks.T.astype(jnp.int32)], axis=1)
        return tokens, cache

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pp_param_pspecs(cfg, tp_axis), P(None, None),
                  pp_cache_pspec(tp_axis, cfg), P(None)),
        out_specs=(P(None, None), pp_cache_pspec(tp_axis, cfg)),
        check_vma=False,
    )
    donate = (2,) if serve.donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)
