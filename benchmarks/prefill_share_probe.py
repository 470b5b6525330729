"""Where the prefill program's time goes (VERDICT r4 weak #2): the
round-1 e2e prefill number (3820 tok/s at T=512) implies ~31% MFU while
the weight-matmul kernels alone measure 48.8% — this probe traces the
FULL jitted prefill (fused defaults) and aggregates device op self-time
into classes (weight matmuls / attention / norms+elementwise / other),
so the kernel-vs-program gap is explained by name rather than guessed.

    python benchmarks/prefill_share_probe.py [--cases 512x1,2048x1]
"""
import argparse
import dataclasses
import functools
import glob
import json
import re
import sys
import time
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
    fuse_projections,
    init_llama_params,
    prefill,
)
from quantizations_tpu.utils.profiling import trace

# v5e bf16 MXU peak (PARITY roofline section uses the same constant)
V5E_BF16_TFLOPS = 197.0

_CLASSES = (
    # hlo_category markers from the chrome trace (r5 measured shares at
    # T=512: conv 43.4% / loop-fusion dequant 35.4% / data-formatting
    # copies 16.0% — the matmuls themselves run ~88% MFU; the e2e gap
    # IS the dense-dequant materialization + stacked-word slice copies)
    ("mxu_matmul", re.compile(r"\[convolution", re.I)),
    ("dequant_loop", re.compile(r"\[loop fusion\]", re.I)),
    ("copy_layout", re.compile(
        r"\[data formatting\]|copy|transpose|reshape|bitcast|slice"
        r"|concatenate|pad", re.I)),
    ("pallas_call", re.compile(r"custom", re.I)),
    ("attention", re.compile(r"attention|flash|softmax|attend", re.I)),
    ("norm_elemwise", re.compile(
        r"rms|norm|rsqrt|mul|add|sub|exp|rotary|rope", re.I)),
)


def device_rows(log_dir: str):
    """Aggregate device op durations straight from the chrome trace —
    xprof's framework_op_stats tool returns ZERO rows for traces taken
    through the axon tunnel (every round-4 attempt failed the same
    way), while the trace.json.gz demonstrably carries the full
    /device:TPU event stream (r5 finding)."""
    import collections
    import gzip

    traces = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*"
                              ".trace.json.gz"))
    if not traces:
        return []
    d = json.loads(gzip.open(traces[-1]).read())
    ev = d.get("traceEvents", [])
    names = {e["pid"]: e["args"].get("name", "")
             for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in names.items() if "device" in n.lower()}
    if not dev_pids:        # CPU smoke: take the busiest pid
        cnt = collections.Counter(e.get("pid") for e in ev
                                  if e.get("ph") == "X")
        dev_pids = {cnt.most_common(1)[0][0]} if cnt else set()
    tot = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        # container events (jit wrapper, while loop) nest their children
        # and would double-count
        if e.get("name", "").startswith(("jit_", "while", "body",
                                         "condition")):
            continue
        cat = e.get("args", {}).get("hlo_category", "?")
        tot[(e["name"], cat)] += e.get("dur", 0)
    return [(f"[{c}] {n}", t) for (n, c), t in tot.items()]


def classify(name: str) -> str:
    for cls, rx in _CLASSES:
        if rx.search(name):
            return cls
    return "other"


def weight_matmul_flops(cfg, T: int, B: int) -> float:
    """2*T*K*M over the 7 projections + lm_head (the MXU work the 48.8%
    kernel MFU row counts)."""
    h, inter = cfg.hidden_size, cfg.intermediate_size
    kvd = cfg.num_key_value_heads * cfg.head_dim
    qd = cfg.num_attention_heads * cfg.head_dim
    per_layer = (h * qd + 2 * h * kvd + qd * h          # q,k,v,o
                 + 3 * h * inter)                       # gate,up,down
    total = cfg.num_hidden_layers * per_layer + h * cfg.vocab_size
    return 2.0 * T * B * total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", default="512x1,2048x1")
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--quant-type", default="fp4", choices=["fp4", "nf4"])
    p.add_argument("--preset", default="8b", choices=["8b", "tiny"])
    args = p.parse_args()

    from quantizations_tpu.models.llama import TINY_LLAMA

    base = LLAMA3_8B if args.preset == "8b" else TINY_LLAMA
    cfg = dataclasses.replace(
        base, quant=QuantConfig(quant_type=args.quant_type))
    params = init_llama_params(cfg, seed=0)
    if not args.no_fuse:
        params = fuse_projections(params)
    jax.block_until_ready(params)

    for case in args.cases.split(","):
        T, B = (int(v) for v in case.split("x"))
        pf = jax.jit(functools.partial(
            prefill, cfg=cfg, last_token_only=True))
        ids = jnp.tile((jnp.arange(T, dtype=jnp.int32)[None, :] * 7 + 11
                        ) % cfg.vocab_size, (B, 1))
        cache = KVCache.create(cfg, B, T + 64)
        out, _ = pf(params, ids, cache)
        np.asarray(out)
        ts = []
        for _ in range(3):
            c = KVCache.create(cfg, B, T + 64)
            t0 = time.perf_counter()
            out, _ = pf(params, ids, c)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        mm_flops = weight_matmul_flops(cfg, T, B)
        print(f"\nprefill T={T} B={B}: {dt*1e3:.1f} ms = "
              f"{T*B/dt:.0f} tok/s | weight-matmul MFU at e2e wall "
              f"{mm_flops/dt/1e12/V5E_BF16_TFLOPS*100:.1f}%", flush=True)

        log_dir = f"/tmp/prefill_share_{T}x{B}"
        with trace(log_dir):
            for _ in range(3):
                out, _ = pf(params, ids, KVCache.create(cfg, B, T + 64))
            np.asarray(out)
        rows = device_rows(log_dir)
        tot = sum(t for _, t in rows) or 1.0
        agg = {}
        for name, t in rows:
            agg[classify(name)] = agg.get(classify(name), 0.0) + t
        print(f"  device self-time total {tot/1e3:.1f} ms (3 traced "
              f"calls); shares:", flush=True)
        for cls in sorted(agg, key=lambda c: -agg[c]):
            print(f"    {cls:14s} {agg[cls]/1e3:8.2f} ms  "
                  f"{agg[cls]/tot*100:5.1f}%", flush=True)
        # the MXU class at device time = the matmuls' own-kernel MFU
        wm = agg.get("mxu_matmul", 0.0) * 1e-6 / 3   # trace holds 3 calls
        if wm:
            print(f"  mxu class alone: "
                  f"{mm_flops/wm/1e12/V5E_BF16_TFLOPS*100:.1f}% MFU "
                  f"over {wm*1e3:.1f} ms/call", flush=True)
        print("  top ops:", flush=True)
        for name, t in sorted(rows, key=lambda r: -r[1])[:10]:
            print(f"    {t:10.1f} us  {name}", flush=True)


if __name__ == "__main__":
    main()
