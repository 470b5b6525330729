"""Decompose the decode-step time on real hardware (production paths).

Measures, with the serialized scan-chain timer:
  1. sum-of-GEMVs: each projection + lm_head as standalone fused pair
     kernels through the production `_ql` dispatch (what the decode
     step should cost if attention/norms/scan machinery were free)
  2. one full production `decode_step` (lax.scan over stacked layers —
     exactly what `make_generate_fn` runs per token)
  3. the same math UNROLLED: python loop over per-layer unstacked
     weights (no stacked scalar-prefetch indexing, no scan carry) —
     the scan-machinery tax is (2) - (3)

    python benchmarks/decode_profile.py [--layers N] [--fuse] [--quant-type nf4]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses
import functools

from quantizations_tpu.config import QuantConfig
from quantizations_tpu.models.llama import (
    KVCache,
    LLAMA3_8B,
    _layer_forward,
    _norm,
    _ql,
    decode_step,
    embed_lookup,
    init_llama_params,
    layer_window,
    rope_cos_sin,
)
from quantizations_tpu.utils.timing import time_scan_chain

HBM_GBPS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--max-seq", type=int, default=128)
    p.add_argument("--quant-type", default="fp4", choices=["fp4", "nf4"])
    p.add_argument("--fuse", action="store_true")
    p.add_argument("--scales-dtype", default="fp32",
                   choices=["fp32", "bf16"],
                   help="scale STORAGE dtype — localizes the measured "
                        "~8%% b1 / ~16%% b8 e2e tax of bf16 scale "
                        "storage (bench chain_r4b): if the standalone "
                        "GEMV rows are flat but the scan step regresses, "
                        "the tax is XLA-level around the kernels")
    args = p.parse_args()

    cfg = dataclasses.replace(
        LLAMA3_8B, num_hidden_layers=args.layers,
        quant=QuantConfig(
            quant_type=args.quant_type,
            scales_dtype=(jnp.bfloat16 if args.scales_dtype == "bf16"
                          else jnp.float32)))
    L = cfg.num_hidden_layers
    params = init_llama_params(cfg, seed=0)
    if args.fuse:
        from quantizations_tpu.models.llama import fuse_projections

        params = fuse_projections(params)
    jax.block_until_ready(params)

    wbytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(params.layers)) + sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params.lm_head))
    print(f"layers={L} transformer+head weight bytes: {wbytes/2**30:.2f} GiB"
          f"  SOL={wbytes/HBM_GBPS/1e6:.2f} ms", flush=True)

    isleaf = lambda x: x is None

    # -- 1. standalone GEMV sum (production _ql dispatch, pair-aware) ----
    lay0 = jax.tree.map(lambda x: None if x is None else x[0],
                        params.layers, is_leaf=isleaf)
    names = (["qkv", "o", "gate_up", "down"] if args.fuse
             else ["q", "k", "v", "o", "gate", "up", "down"])
    total_us = 0.0
    for name in names:
        ql = getattr(lay0, name)
        x0 = jnp.ones((1, ql.in_features), jnp.bfloat16)
        # weights ride as scan-chain operands, NOT jit-closure constants
        # (a closed-over lm_head embeds 250 MB of constants in the HLO
        # and the remote compile service rejects the upload, HTTP 413)
        fn = lambda x, w, sc: _ql(x, type(ql)(wp=w, scales=sc),
                                  cfg.quant, None)
        dt = time_scan_chain(fn, x0, iters=50, trials=2,
                             consts=(ql.wp, ql.scales))
        nbytes = ql.wp.nbytes + ql.scales.nbytes
        print(f"  gemv {name:8s} M={ql.out_features:6d} "
              f"K={ql.in_features:6d} {dt*1e6:8.1f}us  "
              f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)
        total_us += dt * 1e6
    head_us = 0.0
    if hasattr(params.lm_head, "wp"):
        ql = params.lm_head
        x0 = jnp.ones((1, ql.in_features), jnp.bfloat16)
        fn = lambda x, w, sc: _ql(x, type(ql)(wp=w, scales=sc),
                                  cfg.quant, None)
        dt = time_scan_chain(fn, x0, iters=50, trials=2,
                             consts=(ql.wp, ql.scales))
        nbytes = ql.wp.nbytes + ql.scales.nbytes
        print(f"  gemv {'head':8s} M={ql.out_features:6d} "
              f"K={ql.in_features:6d} {dt*1e6:8.1f}us  "
              f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)
        head_us = dt * 1e6
    sum_ms = (L * total_us + head_us) / 1e3
    print(f"  => sum of GEMVs: {L} layers x {total_us:.0f}us + head "
          f"{head_us:.0f}us = {sum_ms:.2f} ms", flush=True)

    # -- 2. full production decode_step (scan over stacked layers) -------
    cache = KVCache.create(cfg, 1, args.max_seq)
    pos = jnp.array([17], jnp.int32)
    tok0 = jnp.array([[7]], jnp.int32)
    dt_scan = time_scan_chain(
        lambda t, prm, c: decode_step(prm, t, c, pos, cfg)[0],
        tok0, iters=20, trials=2, consts=(params, cache))
    print(f"\n  decode step (scan):     {dt_scan*1e3:8.2f} ms  "
          f"({wbytes/dt_scan/1e9:.1f} GB/s effective)", flush=True)

    # -- 3. unrolled static layers (no stacked indexing, no scan) --------
    per_layer = jax.block_until_ready([
        jax.tree.map(lambda x: None if x is None else x[i],
                     params.layers, is_leaf=isleaf)
        for i in range(L)])

    def unrolled(tok, params, cache, *per_layer):
        x = embed_lookup(params.embed, tok,
                         cfg.quant.quant_type)          # [1, 1, hidden]
        if cfg.embed_normalizer:
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
        positions = pos[:, None]
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                                cfg.rope_scaling)
        key_pos = jnp.arange(args.max_seq, dtype=jnp.int32)
        mask = key_pos[None, None, :] <= positions[:, :, None]
        ck, cv = cache.k, cache.v
        for i in range(L):
            _, win_eff = layer_window(cfg, i)
            x, ck, cv = _layer_forward(
                x, per_layer[i], ck, cv, pos, cos, sin, mask, cfg,
                idx=i, win_eff=win_eff)
        x = _norm(x, params.final_norm, cfg)
        return _ql(x.astype(cfg.quant.compute_dtype).reshape(1, -1),
                   params.lm_head, cfg.quant, None)

    dt_unr = time_scan_chain(unrolled, tok0, iters=20, trials=2,
                             consts=(params, cache, *per_layer))
    print(f"  decode step (unrolled): {dt_unr*1e3:8.2f} ms  "
          f"(scan-machinery tax {1e3*(dt_scan-dt_unr):+.2f} ms)",
          flush=True)
    print(f"  non-GEMV time (scan - sum): "
          f"{dt_scan*1e3 - sum_ms:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
