"""End-to-end prefill throughput (VERDICT r3 #8 refresh): the full
jitted model prefill (embed -> 32 scanned layers -> last-token head) at
T x B grid with serving-time projection fusion ON (the single-device
serving configuration bench.py defaults to).

    python benchmarks/prefill_e2e.py [--no-fuse] [--quant-type nf4]
"""
import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses

from quantizations_tpu.config import QuantConfig
from quantizations_tpu.models.llama import (
    KVCache,
    LLAMA3_8B,
    fuse_projections,
    init_llama_params,
    prefill,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--quant-type", default="fp4", choices=["fp4", "nf4"])
    p.add_argument("--cases", default="512x1,512x8,2048x1,2048x8",
                   help="comma list of TxB")
    args = p.parse_args()

    cfg = dataclasses.replace(
        LLAMA3_8B, quant=QuantConfig(quant_type=args.quant_type))
    params = init_llama_params(cfg, seed=0)
    if not args.no_fuse:
        params = fuse_projections(params)
    jax.block_until_ready(params)

    for case in args.cases.split(","):
        T, B = (int(v) for v in case.split("x"))
        max_seq = T + 64
        try:
            pf = jax.jit(functools.partial(
                prefill, cfg=cfg, last_token_only=True))
            ids = (jnp.arange(T, dtype=jnp.int32)[None, :] * 7 + 11
                   ) % cfg.vocab_size
            ids = jnp.tile(ids, (B, 1))
            out, _ = pf(params, ids, KVCache.create(cfg, B, max_seq))
            np.asarray(out)
            ts = []
            for _ in range(3):
                cache = KVCache.create(cfg, B, max_seq)
                t0 = time.perf_counter()
                out, _ = pf(params, ids, cache)
                np.asarray(out)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"prefill T={T} B={B} fuse={not args.no_fuse} "
                  f"{args.quant_type}: {dt*1e3:8.1f} ms = "
                  f"{T*B/dt:9.1f} tok/s", flush=True)
        except Exception as e:
            print(f"prefill T={T} B={B}: FAILED {str(e)[:2000]}",
                  flush=True)


if __name__ == "__main__":
    main()
