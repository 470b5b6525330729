"""Decompose the decode-step time on real hardware.

Measures, with the serialized scan-chain timer:
  1. sum-of-GEMVs: the 7 projections + lm_head as standalone fused
     kernels (what the decode step should cost if everything else is free)
  2. one full decode_step via lax.scan over stacked layers (the default)
  3. one full decode_step with layers UNROLLED (static per-layer arrays —
     no dynamic-slice copy of the weights before each Pallas call)

    python benchmarks/decode_profile.py [--layers N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses
import functools

from quantizations_tpu.config import QuantConfig
from quantizations_tpu.models.llama import (
    KVCache,
    LLAMA3_8B,
    _layer_forward,
    init_llama_params,
    rope_cos_sin,
)
from quantizations_tpu.ops.gemv import gemv_4bit_pallas
from quantizations_tpu.utils.timing import time_scan_chain

HBM_GBPS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--max-seq", type=int, default=128)
    args = p.parse_args()

    cfg = dataclasses.replace(
        LLAMA3_8B, num_hidden_layers=args.layers, quant=QuantConfig())
    L = cfg.num_hidden_layers
    params = init_llama_params(cfg, seed=0)
    jax.block_until_ready(params.layers.q.wp)

    wbytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(params.layers)) + sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params.lm_head))
    print(f"layers={L} transformer+head weight bytes: {wbytes/2**30:.2f} GiB"
          f"  SOL={wbytes/HBM_GBPS/1e6*1000:.2f} ms")

    # -- 1. standalone GEMV sum ------------------------------------------
    lay0 = jax.tree.map(lambda x: x[0], params.layers)
    shapes = [
        ("q", lay0.q), ("k", lay0.k), ("v", lay0.v), ("o", lay0.o),
        ("gate", lay0.gate), ("up", lay0.up), ("down", lay0.down),
    ]
    total_us = 0.0
    for name, ql in shapes:
        K = ql.wp.shape[1] * 8
        x0 = jnp.ones((1, K), jnp.bfloat16)
        fn = lambda x, _ql=ql: gemv_4bit_pallas(
            _ql.wp, _ql.scales, x, quant_type="fp4")
        dt = time_scan_chain(fn, x0, iters=30, trials=2)
        nbytes = ql.wp.nbytes + ql.scales.nbytes
        print(f"  gemv {name:5s} M={ql.wp.shape[0]:6d} K={K:6d} "
              f"{dt*1e6:8.1f}us  {nbytes/dt/1e9:6.1f} GB/s")
        total_us += dt * 1e6
    if hasattr(params.lm_head, "wp"):
        ql = params.lm_head
        x0 = jnp.ones((1, ql.wp.shape[1] * 8), jnp.bfloat16)
        dt = time_scan_chain(
            lambda x: gemv_4bit_pallas(ql.wp, ql.scales, x, quant_type="fp4"),
            x0, iters=30, trials=2)
        nbytes = ql.wp.nbytes + ql.scales.nbytes
        print(f"  gemv head  M={ql.wp.shape[0]:6d} K={ql.wp.shape[1]*8:6d} "
              f"{dt*1e6:8.1f}us  {nbytes/dt/1e9:6.1f} GB/s")
        head_us = dt * 1e6
    else:
        head_us = 0.0
    print(f"  => sum of GEMVs: {L} layers x {total_us:.0f}us + head "
          f"{head_us:.0f}us = {(L * total_us + head_us)/1e3:.2f} ms")

    # -- 2. full decode step, scan over stacked layers --------------------
    cache = KVCache.create(cfg, 1, args.max_seq)
    pos = jnp.array([17], jnp.int32)
    cos, sin = rope_cos_sin(jnp.array([[17]], jnp.int32), cfg.head_dim,
                            cfg.rope_theta)
    key_pos = jnp.arange(args.max_seq, dtype=jnp.int32)
    mask = (key_pos[None, None, :] <= jnp.array([[[17]]], jnp.int32)
            )  # [B, T, S]

    def body_scan(x):
        def body(carry, inputs):
            xx, ck, cv = carry
            layer, i = inputs
            xx, ck_i, cv_i = _layer_forward(
                xx, layer, ck[i], cv[i], pos, cos, sin, mask, cfg)
            ck = jax.lax.dynamic_update_slice_in_dim(ck, ck_i[None], i, 0)
            cv = jax.lax.dynamic_update_slice_in_dim(cv, cv_i[None], i, 0)
            return (xx, ck, cv), None

        idx = jnp.arange(L, dtype=jnp.int32)
        (x, _, _), _ = jax.lax.scan(
            body, (x, cache.k, cache.v), (params.layers, idx))
        return x

    x0 = jnp.ones((1, 1, cfg.hidden_size), jnp.bfloat16)
    dt_scan = time_scan_chain(body_scan, x0, iters=20, trials=2)
    lb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params.layers))
    print(f"\n  decode body (scan):     {dt_scan*1e3:8.2f} ms  "
          f"({lb/dt_scan/1e9:.1f} GB/s effective)")

    # -- 3. full decode step, unrolled static layers ----------------------
    per_layer = [jax.tree.map(lambda x, i=i: x[i], params.layers)
                 for i in range(L)]
    per_layer = jax.block_until_ready(per_layer)

    def body_unrolled(x):
        ck = cache.k
        cv = cache.v
        for i in range(L):
            x, _, _ = _layer_forward(
                x, per_layer[i], ck[i], cv[i], pos, cos, sin, mask, cfg)
        return x

    dt_unr = time_scan_chain(body_unrolled, x0, iters=20, trials=2)
    print(f"  decode body (unrolled): {dt_unr*1e3:8.2f} ms  "
          f"({lb/dt_unr/1e9:.1f} GB/s effective)")


if __name__ == "__main__":
    main()
