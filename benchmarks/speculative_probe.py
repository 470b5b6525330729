"""Speculative (prompt-lookup) decode TPS vs plain greedy on the 8B
model (random weights; greedy output on random weights is typically
cyclic, so lookup acceptance is high — treat as the repetitive-text
upper bound; real-text acceptance depends on content).

    python benchmarks/speculative_probe.py [--preset tiny]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache, LLAMA3_8B, TINY_LLAMA, init_llama_params)
from quantizations_tpu.serve.generate import make_generate_fn
from quantizations_tpu.serve.speculative import make_speculative_generate_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="8b", choices=["8b", "tiny"])
    p.add_argument("--new-tokens", type=int, default=120)
    p.add_argument("--draft-k", type=int, default=8)
    args = p.parse_args()

    cfg = LLAMA3_8B if args.preset == "8b" else TINY_LLAMA
    serve = ServeConfig(max_seq_len=512, max_new_tokens=args.new_tokens,
                        temperature=0.0)
    params = init_llama_params(cfg, seed=0)
    jax.block_until_ready(params)
    ids = (jnp.arange(16, dtype=jnp.int32)[None, :] * 7 + 11
           ) % cfg.vocab_size

    gen = make_generate_fn(cfg, serve)
    spec = make_speculative_generate_fn(cfg, serve, draft_k=args.draft_k)

    def run(fn, unpack):
        cache = KVCache.create(cfg, 1, serve.max_seq_len)
        t0 = time.perf_counter()
        res = fn(params, ids, cache, jax.random.PRNGKey(0))
        toks = np.asarray(res[0])
        dt = time.perf_counter() - t0
        steps = int(res[1]) if unpack == 3 else args.new_tokens
        return dt, toks, steps

    run(gen, 2); run(spec, 3)                      # compile
    dt_g = min(run(gen, 2)[0] for _ in range(3))
    dt_s, toks_s, steps = min(
        (run(spec, 3) for _ in range(3)), key=lambda r: r[0])
    dt_g2, toks_g, _ = run(gen, 2)
    match = bool((toks_s == toks_g).all())
    print(f"greedy : {args.new_tokens/dt_g:8.1f} tok/s "
          f"({dt_g*1e3:.0f} ms)")
    print(f"spec   : {args.new_tokens/dt_s:8.1f} tok/s "
          f"({dt_s*1e3:.0f} ms)  verify steps {steps} "
          f"({args.new_tokens/steps:.2f} tokens/step)")
    print(f"outputs token-identical: {match}")


if __name__ == "__main__":
    main()
