"""int8 KV capacity line (round 5): at 2048 ctx the bf16 cache still
fits b32 (12.8 GB incl. weights) and int8 LOSES latency at every batch
— so int8's remaining value is the capacity line at LONGER context.
At 4096 ctx a bf16 cache is 536 MB/row: b32 = 17.2 GB + 4.2 GB weights
> v5e HBM, while int8 halves it. This probe walks the (dtype, batch)
grid at max_seq 4096, catches per-case OOM, and prints tok/s or OOM —
the driver-visible form of "int8 KV buys you 2x the live tokens".

    python benchmarks/kv_capacity_probe.py [--max-seq 4096]
"""
import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.config import QuantConfig, ServeConfig
from quantizations_tpu.models.llama import (
    KVCache,
    LLAMA3_8B,
    fuse_projections,
    init_llama_params,
)
from quantizations_tpu.serve.generate import make_generate_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-seq", type=int, default=4096)
    p.add_argument("--batches", default="16,32")
    p.add_argument("--new-tokens", type=int, default=16)
    args = p.parse_args()

    # int8 first: the bf16 b32 case is EXPECTED to OOM, and a device
    # OOM can leave the client in a degraded state — keep it last
    for kv in ("int8", "bf16"):
        cfg = dataclasses.replace(
            LLAMA3_8B, kv_cache_dtype=kv,
            quant=QuantConfig(quantize_embedding=True))
        params = fuse_projections(init_llama_params(cfg, seed=0))
        jax.block_until_ready(params)
        serve = ServeConfig(max_seq_len=args.max_seq,
                            max_new_tokens=args.new_tokens,
                            temperature=0.0, donate_cache=True)
        for B in (int(b) for b in args.batches.split(",")):
            cache_gb = (2 * cfg.num_hidden_layers * cfg.num_key_value_heads
                        * cfg.head_dim * args.max_seq * B
                        * (2 if kv == "bf16" else 1)) / 2**30
            try:
                gen = make_generate_fn(cfg, serve)
                ids = jnp.tile(
                    (jnp.arange(16, dtype=jnp.int32)[None, :] * 7 + 11)
                    % cfg.vocab_size, (B, 1))
                key = jax.random.PRNGKey(0)

                def run():
                    c = KVCache.create(cfg, B, serve.max_seq_len)
                    t0 = time.perf_counter()
                    toks, _ = gen(params, ids, c, key)
                    np.asarray(toks)   # surfaces async OOM
                    return time.perf_counter() - t0

                run()
                dt = min(run() for _ in range(2))
                print(f"kv={kv} B={B} max_seq={args.max_seq} "
                      f"(cache {cache_gb:.1f} GiB): "
                      f"{args.new_tokens * B / dt:8.1f} tok/s", flush=True)
            except Exception as e:
                msg = str(e)
                kind = ("OOM" if ("RESOURCE_EXHAUSTED" in msg
                                  or "Out of memory" in msg
                                  or "exceeds the amount" in msg)
                        else "FAILED")
                print(f"kv={kv} B={B} max_seq={args.max_seq} "
                      f"(cache {cache_gb:.1f} GiB): {kind} "
                      f"{msg.splitlines()[0][:160]}", flush=True)
        del params


if __name__ == "__main__":
    main()
