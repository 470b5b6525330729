"""Localize the bf16-scale-storage e2e tax (VERDICT r3 missing #3).

bench chain_r4b measured: bf16 scale STORAGE costs ~8% b1 / ~16% b8
decode TPS while the pair kernel itself is scale-dtype-neutral (it
rounds scales to bf16 internally either way). The batch signature
(larger relative cost at shorter steps) points at a FIXED per-step
XLA-level cost — e.g. a layout conversion / copy of the stacked scale
planes around the pallas custom calls. This probe:

1. times one 8-layer decode_step under fp32 vs bf16 scale storage,
2. captures a jax.profiler trace of each and prints the top ops by
   self-time (xprof framework_op_stats, no TensorBoard needed),

so the tax shows up BY NAME (copy/convert/transpose) and can be fixed
at the source (storage layout) rather than worked around.

    python benchmarks/scales_tax_probe.py [--layers 8] [--batch 8]
"""
import argparse
import dataclasses
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.config import QuantConfig
from quantizations_tpu.models.llama import (
    KVCache,
    LLAMA3_8B,
    decode_step,
    init_llama_params,
)
from quantizations_tpu.utils.profiling import trace
from quantizations_tpu.utils.timing import time_scan_chain


def top_ops(log_dir: str, n: int = 14):
    """Print top ops by self-time from an xprof trace dir."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception as e:                      # pragma: no cover
        print(f"  (xprof unavailable: {e})")
        return
    # directories only: a prior parse drops ALL_HOSTS.op_stats.pb files
    # into the profile dir which would otherwise sort last and win
    runs = sorted(p for p in glob.glob(f"{log_dir}/plugins/profile/*")
                  if Path(p).is_dir())
    if not runs:
        print("  (no trace runs found)")
        return
    import json

    data, _ = rtd.xspace_to_tool_data([runs[-1]], "framework_op_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # The gviz payload nesting varies across xprof versions AND backends
    # (TPU traces returned [[table, ...]] / wrapper dicts where the CPU
    # pin was a flat list — round-4 chips logged 'unrecognized schema'
    # every time). Walk the whole JSON and collect ANY dict that looks
    # like a gviz table (has cols+rows).
    recs = []

    def walk(obj):
        if isinstance(obj, dict):
            if "cols" in obj and "rows" in obj:
                try:
                    cols = [c["label"] for c in obj["cols"]]
                    for r in obj["rows"] or []:
                        cells = r.get("c", []) if isinstance(r, dict) else r
                        recs.append({
                            cols[i]: (cell.get("v") if isinstance(
                                cell, dict) else cell)
                            for i, cell in enumerate(cells)
                            if i < len(cols)})
                except Exception:
                    pass
            for v in obj.values():
                walk(v)
        elif isinstance(obj, list):
            for v in obj:
                walk(v)

    walk(rows)
    key_t = next((k for k in ("Total self-time (us)",
                              "Total self time (us)")
                  if recs and k in recs[0]), None)
    key_n = next((k for k in ("Operation Name", "Operation", "Name")
                  if recs and k in recs[0]), None)
    if key_t is None:
        def shape(o, d=0):
            if d > 3:
                return "..."
            if isinstance(o, dict):
                return {k: shape(v, d + 1) for k, v in list(o.items())[:6]}
            if isinstance(o, list):
                return [shape(o[0], d + 1), f"...x{len(o)}"] if o else []
            return type(o).__name__
        print("  (unrecognized op-stats schema; keys: "
              f"{list(recs[0]) if recs else []}; payload shape: "
              f"{shape(rows)})")
        return
    recs.sort(key=lambda r: -float(r[key_t] or 0))
    for r in recs[:n]:
        print(f"  {float(r[key_t] or 0):12.1f} us  "
              f"{r.get('Host/device')}  {r.get(key_n)}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-seq", type=int, default=128)
    p.add_argument("--fuse", action="store_true",
                   help="fuse projections (the bench default): the "
                        "e2e tax only shows with the full bench "
                        "config — tests fusion x scale-dtype")
    p.add_argument("--generate", action="store_true",
                   help="time a 16-token make_generate_fn loop instead "
                        "of one decode_step (tests the while-loop x "
                        "scale-dtype interaction)")
    p.add_argument("--dtypes", default="fp32,bf16",
                   help="comma list of scale storages to race "
                        "(fp32,bf16,bf16x2) — bf16x2 localizes the "
                        "packed-word b1 tax seen in chain_r4f")
    p.add_argument("--lean-embed", action="store_true",
                   help="quantize the embedding too (the bench default "
                        "config; under bf16/bf16x2 the gathered "
                        "embedding keeps unpacked bf16 scales)")
    args = p.parse_args()

    dtype_map = {"fp32": jnp.float32, "bf16": jnp.bfloat16,
                 "bf16x2": "bf16x2"}
    results = {}
    for sd_name in args.dtypes.split(","):
        sd = dtype_map[sd_name]
        cfg = dataclasses.replace(
            LLAMA3_8B, num_hidden_layers=args.layers,
            quant=QuantConfig(scales_dtype=sd,
                              quantize_embedding=args.lean_embed))
        params = init_llama_params(cfg, seed=0)
        if args.fuse:
            from quantizations_tpu.models.llama import fuse_projections

            params = fuse_projections(params)
        jax.block_until_ready(params)
        cache = KVCache.create(cfg, args.batch, args.max_seq)
        pos = jnp.full((args.batch,), 17, jnp.int32)
        tok0 = jnp.full((args.batch, 1), 7, jnp.int32)

        if args.generate:
            import time as _time

            from quantizations_tpu.config import ServeConfig
            from quantizations_tpu.serve.generate import make_generate_fn

            serve = ServeConfig(max_seq_len=args.max_seq,
                                max_new_tokens=16, temperature=0.0,
                                donate_cache=True)
            gen = make_generate_fn(cfg, serve)
            ids = jnp.full((args.batch, 4), 7, jnp.int32)
            key = jax.random.PRNGKey(0)

            def run():
                c = KVCache.create(cfg, args.batch, args.max_seq)
                t0 = _time.perf_counter()
                toks, _ = gen(params, ids, c, key)
                np.asarray(toks)
                return _time.perf_counter() - t0

            run()
            dt = min(run() for _ in range(4)) / 16
            results[sd_name] = dt
            print(f"scales={sd_name}: generate step {dt*1e3:8.2f} ms "
                  f"(B={args.batch}, L={args.layers}, fuse={args.fuse})",
                  flush=True)
            log_dir = f"/tmp/scales_tax_gen_{sd_name}"
            with trace(log_dir):
                run()
            print(f"-- top ops (generate, {sd_name}) --", flush=True)
            top_ops(log_dir, n=18)
            del params
            continue
        dt = time_scan_chain(
            lambda t, prm, c: decode_step(prm, t, c, pos, cfg)[0],
            tok0, iters=20, trials=2, consts=(params, cache))
        results[sd_name] = dt
        print(f"scales={sd_name}: decode step {dt*1e3:8.2f} ms "
              f"(B={args.batch}, L={args.layers}, fuse={args.fuse})",
              flush=True)

        log_dir = f"/tmp/scales_tax_{sd_name}"
        step = jax.jit(lambda prm, t, c: decode_step(prm, t, c, pos, cfg))
        out = step(params, tok0, cache)
        np.asarray(out[0])
        with trace(log_dir):
            for _ in range(5):
                out = step(params, tok0, cache)
            np.asarray(out[0])
        print(f"-- top ops ({sd_name}) --", flush=True)
        top_ops(log_dir)
        del params, cache

    if "fp32" in results:
        for name, dt in results.items():
            if name == "fp32":
                continue
            d = dt / results["fp32"] - 1
            print(f"\n{name}-scales step tax vs fp32: {d*100:+.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
