"""Quantization parity metrics.

The reference's accuracy validation is a single external IFEval run
(reference README.md:28) with no code in the repo. Here parity is
measurable directly: compare the 4-bit model against the same model with
weights dequantized to bf16 (the "what the quantization did" delta) on
any token stream — top-1 agreement, KL divergence and perplexity delta.
When checkpoints + the IFEval dataset are available, `evals.ifeval`
drives the full benchmark; this module is the always-runnable core.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

from ..models.llama import (
    KVCache,
    LlamaConfig,
    LlamaLayer,
    LlamaParams,
    QLinear,
    prefill,
)
__all__ = ["dequantized_params", "logit_parity", "perplexity",
           "ParityReport"]


def _dense_from_qlinear(ql: QLinear, quant_type: str) -> jnp.ndarray:
    """QLinear -> dense bf16 [out, in] in the ORIGINAL column order."""
    from ..nn.linear import dense_weight

    return dense_weight(ql.wp, ql.scales, quant_type, ql.layout)


def dequantized_params(params: LlamaParams,
                       cfg: LlamaConfig) -> LlamaParams:
    """Replace every QLinear with its dequantized dense bf16 matrix —
    the bf16 reference model whose outputs define "parity"."""
    qt = cfg.quant.quant_type

    def conv(leaf):
        return leaf

    def conv_ql(ql_stacked: QLinear) -> jnp.ndarray:
        if ql_stacked.wp.ndim == 3:   # stacked [L, M, K/8]
            return jnp.stack([
                _dense_from_qlinear(
                    QLinear(wp=ql_stacked.wp[i], scales=ql_stacked.scales[i]),
                    qt)
                for i in range(ql_stacked.wp.shape[0])])
        return _dense_from_qlinear(ql_stacked, qt)

    lay = params.layers
    layers = LlamaLayer(
        attn_norm=lay.attn_norm, mlp_norm=lay.mlp_norm,
        q=conv_ql(lay.q), k=conv_ql(lay.k), v=conv_ql(lay.v),
        o=conv_ql(lay.o), gate=conv_ql(lay.gate), up=conv_ql(lay.up),
        down=conv_ql(lay.down),
        # attention_bias (Qwen2) leaves must survive dequantization —
        # dropping them would make parity measure the missing bias, not
        # the quantization error
        q_bias=lay.q_bias, k_bias=lay.k_bias, v_bias=lay.v_bias,
        post_attn_norm=lay.post_attn_norm, post_mlp_norm=lay.post_mlp_norm,
        q_norm=lay.q_norm, k_norm=lay.k_norm,
    )
    lm_head = (conv_ql(params.lm_head)
               if isinstance(params.lm_head, QLinear) else params.lm_head)
    embed = (conv_ql(params.embed).astype(jnp.bfloat16)
             if isinstance(params.embed, QLinear) else params.embed)
    return LlamaParams(embed=embed, layers=layers,
                       final_norm=params.final_norm, lm_head=lm_head)


# Dense-weight forward reuses the quantized model code: QLinear leaves are
# replaced by arrays, so _ql must handle both. Rather than fork the model,
# parity runs the dense model through a thin adapter:

def _densify_tree(tree, qt):
    """Per-layer lazy dequant: every 2-D QLinear leaf becomes its dense
    bf16 matrix IN-JIT (one layer's dense weights are transient VMEM/HBM
    instead of a resident 16 GB twin — an 8B dense twin cannot coexist
    with the quantized model on a 16 GB chip, proxy_evals OOM r3)."""
    return jax.tree.map(
        lambda leaf: (_dense_from_qlinear(leaf, qt)
                      if isinstance(leaf, QLinear) else leaf),
        tree, is_leaf=lambda x: isinstance(x, QLinear))


def _dense_forward(dense: LlamaParams, token_ids: jnp.ndarray,
                   cfg: LlamaConfig, lazy: bool = False) -> jnp.ndarray:
    """Causal forward of the dequantized-dense model; returns logits
    [B, T, vocab]. Mirrors models/llama.py but with jnp.dot projections
    (this is also the independent cross-check of the quantized path).
    With ``lazy=True``, ``dense`` is the QUANTIZED params and each
    layer is dequantized on the fly (same `_dense_from_qlinear` math —
    bit-identical logits to the materialized twin, tested)."""
    B, T = token_ids.shape
    from ..models.llama import _act, _norm, apply_rope, rope_cos_sin

    if lazy and isinstance(dense.embed, QLinear):
        from ..models.llama import embed_lookup

        x = embed_lookup(dense.embed, token_ids,
                         cfg.quant.quant_type).astype(jnp.bfloat16)
    else:
        x = dense.embed[token_ids].astype(jnp.bfloat16)
    if cfg.embed_normalizer:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    pos = jnp.zeros((B,), jnp.int32)
    positions = pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            cfg.rope_scaling)
    qp = jnp.arange(T)[:, None]
    kp = jnp.arange(T)[None, :]
    mask_full = (kp <= qp)[None]
    mask_win = mask_full
    if cfg.sliding_window is not None:
        # Mistral-style window — without this the dense reference would
        # attend MORE than the quantized model and parity would measure
        # the window, not the quantization
        mask_win = mask_full & (kp > qp - cfg.sliding_window)[None]

    def proj(x2, W):
        return jnp.dot(x2.astype(jnp.bfloat16), W.T,
                       preferred_element_type=jnp.float32)

    L = cfg.num_hidden_layers
    D = cfg.head_dim
    for i in range(L):
        lay = jax.tree.map(lambda a, i=i: a[i], dense.layers)
        if lazy:
            lay = _densify_tree(lay, cfg.quant.quant_type)
        if cfg.sliding_window is None or cfg.sliding_layers == "all":
            mask = mask_win
        else:
            use_win = (i % 2 == 0 if cfg.sliding_layers == "even"
                       else i % 2 == 1)
            mask = mask_win if use_win else mask_full
        n_q = lay.q.shape[0] // D
        n_kv = lay.k.shape[0] // D
        G = n_q // n_kv
        xa = _norm(x, lay.attn_norm, cfg)
        x2 = xa.reshape(B * T, -1)
        q = proj(x2, lay.q)
        k = proj(x2, lay.k)
        v = proj(x2, lay.v)
        if lay.q_bias is not None:
            q = q + lay.q_bias.astype(q.dtype)
            k = k + lay.k_bias.astype(k.dtype)
            v = v + lay.v_bias.astype(v.dtype)
        q = q.reshape(B, T, n_q, D)
        k = k.reshape(B, T, n_kv, D)
        v = v.reshape(B, T, n_kv, D)
        if lay.q_norm is not None:
            from ..models.llama import rms_norm

            q = rms_norm(q, lay.q_norm, cfg.rms_norm_eps)
            k = rms_norm(k, lay.k_norm, cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        qg = q.reshape(B, T, n_kv, G, D).astype(jnp.float32)
        scores = jnp.einsum(
            "btkgd,bskd->btkgs", qg, k.astype(jnp.float32)
        ) * ((cfg.query_scale or D) ** -0.5)
        if cfg.attn_logit_softcap is not None:
            cap = cfg.attn_logit_softcap
            scores = cap * jnp.tanh(scores / cap)
        scores = jnp.where(mask[:, :, None, None, :], scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("btkgs,bskd->btkgd", w, v.astype(jnp.float32))
        o = proj(attn.reshape(B * T, -1), lay.o)
        ob = o.reshape(B, T, -1)
        if lay.post_attn_norm is not None:
            ob = _norm(ob, lay.post_attn_norm, cfg)
        x = x + ob.astype(x.dtype)
        xm = _norm(x, lay.mlp_norm, cfg)
        x2 = xm.reshape(B * T, -1)
        act = _act(proj(x2, lay.gate), cfg) * proj(x2, lay.up)
        d = proj(act, lay.down)
        db = d.reshape(B, T, -1)
        if lay.post_mlp_norm is not None:
            db = _norm(db, lay.post_mlp_norm, cfg)
        x = x + db.astype(x.dtype)

    x = _norm(x, dense.final_norm, cfg)
    head = dense.lm_head
    if lazy and isinstance(head, QLinear):
        head = _dense_from_qlinear(head, cfg.quant.quant_type)
    logits = jnp.einsum("bth,vh->btv", x.astype(jnp.bfloat16),
                        head.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    return logits


@dataclasses.dataclass
class ParityReport:
    top1_agreement: float     # fraction of positions with same argmax
    mean_kl: float            # KL(dense || quantized), nats/token
    max_abs_logit_delta: float
    ppl_quant: float
    ppl_dense: float

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def logit_parity(params: LlamaParams, cfg: LlamaConfig,
                 token_ids: jnp.ndarray) -> ParityReport:
    """Run both models over ``token_ids [B, T]`` and report deltas.

    Note: for a *weight-only* 4-bit scheme this measures exactly the
    quantization error (activations/arithmetic identical paths)."""
    B, T = token_ids.shape
    # A materialized dense twin needs ~4x the quantized footprint
    # resident at once (16.1 GB for 8B — over a v5e's 16 GB HBM, OOM
    # observed on-chip r3). Above ~4 GB of dense-twin bytes the twin
    # runs LAZILY: the same dequant math per layer, in-jit, transient.
    dense_bytes = sum(
        2 * leaf.out_features * leaf.in_features
        * (leaf.wp.shape[0] if leaf.wp.ndim == 3 else 1)
        for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QLinear))
        if isinstance(leaf, QLinear))
    lazy = dense_bytes > 4 * 2**30

    cache = KVCache.create(cfg, B, T)
    ql, _ = jax.jit(functools.partial(prefill, cfg=cfg))(
        params, token_ids, cache)
    dense = params if lazy else dequantized_params(params, cfg)
    dl = jax.jit(functools.partial(_dense_forward, cfg=cfg, lazy=lazy))(
        dense, token_ids)

    qlp = jax.nn.log_softmax(ql.astype(jnp.float32), axis=-1)
    dlp = jax.nn.log_softmax(dl.astype(jnp.float32), axis=-1)
    top1 = float(jnp.mean(
        (jnp.argmax(ql, -1) == jnp.argmax(dl, -1)).astype(jnp.float32)))
    kl = float(jnp.mean(jnp.sum(jnp.exp(dlp) * (dlp - qlp), axis=-1)))
    mad = float(jnp.max(jnp.abs(ql - dl)))

    # next-token perplexity over the stream itself
    tgt = token_ids[:, 1:]
    gather = lambda lp: jnp.take_along_axis(
        lp[:, :-1], tgt[..., None], axis=-1)[..., 0]
    ppl_q = float(jnp.exp(-jnp.mean(gather(qlp))))
    ppl_d = float(jnp.exp(-jnp.mean(gather(dlp))))
    return ParityReport(top1_agreement=top1, mean_kl=kl,
                        max_abs_logit_delta=mad,
                        ppl_quant=ppl_q, ppl_dense=ppl_d)


def perplexity(params: LlamaParams, cfg: LlamaConfig,
               token_ids: jnp.ndarray) -> float:
    """Next-token perplexity of the quantized model on a token stream."""
    B, T = token_ids.shape
    cache = KVCache.create(cfg, B, T)
    logits, _ = jax.jit(functools.partial(prefill, cfg=cfg))(
        params, token_ids, cache)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = token_ids[:, 1:]
    nll = -jnp.mean(jnp.take_along_axis(
        lp[:, :-1], tgt[..., None], axis=-1))
    return float(jnp.exp(nll))
