"""Tensor-parallel shardings for the Llama model (Megatron-style, TPU-native).

Layout over the "tp" mesh axis:

- q/k/v/gate/up projections: **column-parallel** — packed words ``wp
  [L, M, K/8]`` and scales ``[L, M, K/64]`` sharded on the output-row
  axis M. Attention heads (and KV heads) land whole on shards; the
  64-element quant blocks are untouched because only rows split.
- o/down projections: **row-parallel** — sharded on the K axis. The
  packed K/8 and scale K/64 axes shard congruently as long as
  ``K / tp`` is a multiple of the 64-element block (asserted below), so
  no quant block ever straddles a shard boundary.
- KV cache: sharded on the kv-heads axis (same split as k/v outputs —
  the cache is written by shard-local projections, no resharding).
- embed + norms: replicated. lm_head: column-parallel on vocab.

Inside ``shard_map`` the forward runs on per-shard shapes; the only
collectives are one ``psum`` after o_proj, one after down_proj (partial
row-parallel sums) and one tiled ``all_gather`` of the vocab-sharded
logits — all riding ICI.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ServeConfig
from ..models.llama import KVCache, LlamaConfig, LlamaLayer, LlamaParams, QLinear
from ..serve.generate import _generate_impl

__all__ = [
    "llama_param_pspecs",
    "cache_pspec",
    "shard_llama_params",
    "fuse_projections_tp",
    "make_sharded_generate_fn",
    "validate_tp",
]

AXIS = "tp"


def validate_tp(cfg: LlamaConfig, tp: int) -> None:
    """Check the model divides over ``tp`` shards without splitting
    attention heads or 64-element quant blocks."""
    bs = max(cfg.quant.blocksize, 64)
    checks = [
        (cfg.num_key_value_heads % tp == 0,
         f"kv_heads {cfg.num_key_value_heads} % tp {tp}"),
        (cfg.num_attention_heads % tp == 0,
         f"q_heads {cfg.num_attention_heads} % tp {tp}"),
        ((cfg.q_size // tp) % bs == 0, "o_proj K shard vs quant block"),
        ((cfg.intermediate_size // tp) % bs == 0,
         "down_proj K shard vs quant block"),
        (cfg.intermediate_size % tp == 0, "intermediate % tp"),
        (cfg.vocab_size % tp == 0, "vocab % tp"),
    ]
    bad = [msg for ok, msg in checks if not ok]
    if bad:
        raise ValueError(f"config does not shard over tp={tp}: {bad}")


def _col(lead_l: bool) -> QLinear:
    """Column-parallel spec: shard output rows."""
    pre = (None,) if lead_l else ()
    return QLinear(wp=P(*pre, AXIS, None), scales=P(*pre, AXIS, None))


def _row(lead_l: bool) -> QLinear:
    """Row-parallel spec: shard the packed input axis."""
    pre = (None,) if lead_l else ()
    return QLinear(wp=P(*pre, None, AXIS), scales=P(*pre, None, AXIS))


def llama_param_pspecs(cfg: LlamaConfig, fused: bool = False) -> LlamaParams:
    """PartitionSpec pytree matching :class:`LlamaParams`. ``fused``
    matches the :func:`fuse_projections_tp` form — the fused qkv /
    gate_up stay column-parallel on the (shard-blocked) row axis."""
    ab = P(None, AXIS) if cfg.attention_bias else None
    pn = P(None, None) if cfg.post_norms else None    # Gemma-2 sandwich
    qn = P(None, None) if cfg.qk_norm else None       # Qwen3 [head_dim]
    col = _col(True) if not fused else None
    layer = LlamaLayer(
        attn_norm=P(None, None),
        q=col, k=col, v=col, o=_row(True),
        mlp_norm=P(None, None),
        gate=col, up=col, down=_row(True),
        q_bias=None if fused else ab,
        k_bias=None if fused else ab,
        v_bias=None if fused else ab,
        post_attn_norm=pn, post_mlp_norm=pn, q_norm=qn, k_norm=qn,
        qkv=_col(True) if fused else None,
        gate_up=_col(True) if fused else None,
        qkv_bias=ab if fused else None,
    )
    lm_head = (_col(False) if cfg.quant.quantize_lm_head
               else P(AXIS, None))
    embed = (QLinear(wp=P(None, None), scales=P(None, None))
             if cfg.quant.quantize_embedding else P(None, None))
    return LlamaParams(
        embed=embed, layers=layer,
        final_norm=P(None), lm_head=lm_head,
    )


def cache_pspec(cfg: LlamaConfig = None) -> KVCache:
    """[L, B, KV, S, D] — shard kv heads. With an int8 ``cfg`` the
    per-token dequant-step planes [L, B, KV, S] shard on the SAME kv
    axis (codes and their scales always live on the same shard — the
    dequant is shard-local, no collective touches the cache)."""
    kv = P(None, None, AXIS, None, None)
    if cfg is not None and cfg.kv_cache_dtype == "int8":
        sc = P(None, None, AXIS, None)
        return KVCache(k=kv, v=kv, k_scale=sc, v_scale=sc)
    return KVCache(k=kv, v=kv)


def paged_pool_pspec(cfg: LlamaConfig = None):
    """PartitionSpec pytree for a :class:`PagedKVCache`
    ``[L, P, KVH, page, D]`` — kv heads sharded like the slot cache
    (page ids are global, the page axis stays unsharded). Int8 pools
    shard their dequant-step pages [L, P, KVH, page] on the same kv
    axis."""
    from ..serve.paged import PagedKVCache

    kv = P(None, None, AXIS, None, None)
    if cfg is not None and cfg.kv_cache_dtype == "int8":
        sc = P(None, None, AXIS, None)
        return PagedKVCache(pages_k=kv, pages_v=kv,
                            k_scale=sc, v_scale=sc)
    return PagedKVCache(pages_k=kv, pages_v=kv)


def _ensure_planar(ql: QLinear) -> QLinear:
    """Row-parallel (K-sharded) weights must use the planar layout: the
    SWAR pair layout's word axis is shard-LOCAL (its even/odd halves
    don't slice congruently with K), so o/down are repacked before
    placement. Column-parallel pair weights shard fine on the row axis."""
    if ql.layout == "pair":
        from ..models.llama import QLinear as QL
        from ..ops.qmatmul import pair_to_planar, unpack_scale_pairs

        scales = ql.scales
        if ql.scales_packed:
            # planar scales are per-ROW float arrays — widen the packed
            # bf16x2 row-pair words back out (fp32, kernel-neutral)
            scales = unpack_scale_pairs(scales)
        return QL(wp=pair_to_planar(ql.wp), scales=scales)
    return ql


def shard_llama_params(params: LlamaParams, mesh: Mesh,
                       cfg: LlamaConfig) -> LlamaParams:
    """Place a (host or single-device) param pytree onto the mesh."""
    validate_tp(cfg, mesh.shape[AXIS])
    if params.layers.qkv is not None:
        raise ValueError(
            "fused params: TP shards the UNFUSED per-projection form — "
            "shard first, or skip fuse_projections for parallel serving")
    layers = params.layers
    params = params.replace(layers=layers.replace(
        o=_ensure_planar(layers.o), down=_ensure_planar(layers.down)))
    specs = llama_param_pspecs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
    )


def fuse_projections_tp(params: LlamaParams, mesh: Mesh,
                        cfg: LlamaConfig) -> LlamaParams:
    """Per-shard projection fusion for TP-sharded params: each shard
    concatenates its LOCAL q|k|v (gate|up) rows under shard_map, so
    the fused global row order is shard-blocked
    ``[q_0|k_0|v_0 | q_1|k_1|v_1 | …]`` — exactly what the shard-local
    forward slices back apart (per-shard head counts derive from the
    fused rows + the shard-invariant q:kv ratio). The column-parallel
    sharding, o/down row-parallel shards and the psum points are
    untouched, so TP serving gets the same 4-kernels-per-layer decode
    as the single-device :func:`~…models.llama.fuse_projections`.
    Transiently holds both forms on device (~5/7 of the weight bytes)."""
    import jax.numpy as jnp

    st = params.layers
    if st.qkv is not None:
        return params
    cw = P(None, AXIS, None)

    def fuse(qw, qs, kw, ks, vw, vs, gw, gs, uw, us):
        return (jnp.concatenate([qw, kw, vw], axis=1),
                jnp.concatenate([qs, ks, vs], axis=1),
                jnp.concatenate([gw, uw], axis=1),
                jnp.concatenate([gs, us], axis=1))

    fw, fs, guw, gus = jax.jit(jax.shard_map(
        fuse, mesh=mesh, in_specs=(cw,) * 10, out_specs=(cw,) * 4))(
        st.q.wp, st.q.scales, st.k.wp, st.k.scales,
        st.v.wp, st.v.scales,
        st.gate.wp, st.gate.scales, st.up.wp, st.up.scales)
    qkv_bias = None
    if st.q_bias is not None:
        bb = P(None, AXIS)
        qkv_bias = jax.jit(jax.shard_map(
            lambda a, b, c: jnp.concatenate([a, b, c], axis=-1),
            mesh=mesh, in_specs=(bb,) * 3, out_specs=bb))(
            st.q_bias, st.k_bias, st.v_bias)
    layers = st.replace(
        qkv=QLinear(wp=fw, scales=fs),
        gate_up=QLinear(wp=guw, scales=gus), qkv_bias=qkv_bias,
        q=None, k=None, v=None, gate=None, up=None,
        q_bias=None, k_bias=None, v_bias=None)
    return params.replace(layers=layers)


def make_sharded_generate_fn(
    cfg: LlamaConfig,
    serve: ServeConfig,
    mesh: Mesh,
    fused: bool = False,
) -> Callable:
    """shard_map + jit the full generate loop over the mesh.

    Returns ``(params, prompt_ids, cache, key) -> (tokens, cache)`` where
    params/cache are mesh-sharded (see :func:`shard_llama_params`; pass
    ``fused=True`` for :func:`fuse_projections_tp` params) and
    prompt/key/tokens are replicated.
    """
    validate_tp(cfg, mesh.shape[AXIS])
    pspecs = llama_param_pspecs(cfg, fused=fused)
    cspec = cache_pspec(cfg)

    body = functools.partial(
        _generate_impl,
        cfg=cfg,
        max_new_tokens=serve.max_new_tokens,
        temperature=serve.temperature,
        top_k=serve.top_k,
        top_p=serve.top_p,
        eos_id=serve.eos_id,
        axis_name=AXIS,
    )
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P(None, None), cspec, P(None)),
        out_specs=(P(None, None), cspec),
        check_vma=False,
    )
    donate = (2,) if serve.donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)
