"""Continuous-batching engine throughput on the real chip: mixed-length
requests through the slot engine (the serving-realistic aggregate
number, including admission prefills and slot refills).

    python benchmarks/engine_probe.py [--preset tiny]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    LLAMA3_8B, TINY_LLAMA, init_llama_params)
from quantizations_tpu.serve.engine import Engine


def run_replay(args, eng, lens, cfg):
    """Two-pass replay measurement: plain greedy records the streams,
    then a fresh spec_k pass drafts from the recordings (optionally
    corrupted) — spec TPS at a controlled acceptance rate."""
    import random

    from quantizations_tpu.serve.engine import draft_lookup_host

    k = args.spec_k or 8
    prompts = []
    for i in range(args.requests):
        plen, n = lens[i % len(lens)]
        prompts.append(([(j * 7 + i) % cfg.vocab_size
                         for j in range(plen)], n))

    # pass 1: plain greedy (recorded + timed)
    uids = [eng.submit(p, max_new_tokens=n) for p, n in prompts]
    t0 = time.perf_counter()
    done = eng.run()
    dt_plain = time.perf_counter() - t0
    toks_plain = sum(len(r.output_ids) for r in done.values())
    recorded = [list(p) + done[u].output_ids
                for (p, _), u in zip(prompts, uids)]
    eng.finished.clear()

    rng = random.Random(0)

    def replay_draft(hist, kk):
        for s in recorded:
            if len(s) > len(hist) and s[:len(hist)] == hist:
                nxt = s[len(hist):len(hist) + kk]
                nxt = [(t + 1) % cfg.vocab_size
                       if rng.random() < args.corrupt else t
                       for t in nxt]
                return nxt + [0] * (kk - len(nxt))
        return draft_lookup_host(hist, kk)

    eng.draft_fn = replay_draft
    for p, n in prompts:
        eng.submit(p, max_new_tokens=n)
    # warm the spec-window programs outside the timed region
    eng.step_spec(k)
    t0 = time.perf_counter()
    done = eng.run(spec_k=k)
    dt_spec = time.perf_counter() - t0
    toks_spec = sum(len(r.output_ids) for r in done.values())
    st = eng.stats()
    print(f"engine={args.engine} workload=replay corrupt={args.corrupt} "
          f"k={k}\n"
          f"  plain: {toks_plain} tok in {dt_plain:.2f}s = "
          f"{toks_plain/dt_plain:.1f} tok/s\n"
          f"  spec : {toks_spec} tok in {dt_spec:.2f}s = "
          f"{toks_spec/dt_spec:.1f} tok/s  "
          f"accept_rate={st['spec_accept_rate']:.3f} "
          f"({st['spec_accepted']}/{st['spec_drafted']}) "
          f"speedup={(toks_spec/dt_spec)/(toks_plain/dt_plain):.2f}x",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="8b", choices=["8b", "tiny"])
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--requests", type=int, default=24)
    p.add_argument("--steps-per-dispatch", type=int, default=1)
    p.add_argument("--spec-k", type=int, default=0,
                   help=">0: speculative windows (host prompt-lookup "
                        "drafts, one verify dispatch per window)")
    p.add_argument("--engine", default="slot",
                   choices=["slot", "paged"],
                   help="paged: PagedEngine over the page pool (same "
                        "request mix; measures the serving-e2e paged "
                        "tax incl. spd/spec amortization)")
    p.add_argument("--prefix-cache", action="store_true")
    p.add_argument("--workload", default="mixed",
                   choices=["mixed", "repetitive", "replay", "longctx"],
                   help="repetitive: short prompts + long greedy "
                        "generations — small-vocab greedy streams "
                        "loop, so prompt-lookup drafts hit (52.8%% "
                        "acceptance on tiny; an 8B random model never "
                        "loops within the budget, so use replay "
                        "there). mixed: the standard mixed-length "
                        "request set (drafts rarely match — the "
                        "speculative worst case). replay: pass 1 runs "
                        "plain greedy and records the streams, pass 2 "
                        "re-runs with spec_k drafting FROM the "
                        "recordings (greedy verify re-derives the "
                        "same tokens, so acceptance is controlled by "
                        "--corrupt) — the engine-efficiency ceiling "
                        "of the verify-window machinery at known "
                        "acceptance. longctx: ~1.5-1.9k-token prompts "
                        "+ short generations (needs --max-seq 2048) — "
                        "the decode-at-long-context arm where the int8 "
                        "KV cache's halved attention bytes should show")
    p.add_argument("--corrupt", type=float, default=0.0,
                   help="replay mode: corrupt each draft token with "
                        "this probability (sets the acceptance rate)")
    p.add_argument("--max-seq", type=int, default=512,
                   help="cache/pool sequence capacity (must be a "
                        "multiple of --page-size for the paged engine "
                        "— p384 needs 768)")
    p.add_argument("--page-size", type=int, default=256,
                   help="paged pool page size (256 erases the paged-DMA "
                        "tax on v5e, paged_sweep r3)")
    p.add_argument("--fuse", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="serving-time qkv/gate_up fusion (the bench "
                        "default config — paged-vs-slot comparisons "
                        "should match it)")
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"],
                   help="KV cache element type for both engines")
    args = p.parse_args()

    import dataclasses

    cfg = LLAMA3_8B if args.preset == "8b" else TINY_LLAMA
    cfg = dataclasses.replace(cfg, kv_cache_dtype=args.kv_dtype)
    params = init_llama_params(cfg, seed=0)
    if args.fuse:
        from quantizations_tpu.models.llama import fuse_projections

        params = fuse_projections(params)
    jax.block_until_ready(params)

    # long prompts admit in bucket-size chunk rounds; 64-token chunks
    # would put 24x29 prefill dispatches in the timed region
    buckets = (64, 512) if args.workload == "longctx" else (16, 64)
    serve = ServeConfig(max_seq_len=args.max_seq)
    if args.engine == "paged":
        from quantizations_tpu.serve.paged import PagedEngine

        psz = args.page_size
        eng = PagedEngine(
            params, cfg,
            num_pages=args.slots * (args.max_seq // psz) + 8,
            page_size=psz, slots=args.slots, max_seq=args.max_seq,
            prefill_buckets=buckets, prefix_cache=args.prefix_cache)
    else:
        eng = Engine(params, cfg, serve, slots=args.slots,
                     prefill_buckets=buckets)
    lens = [(13, 48), (40, 96), (7, 32), (60, 64)]
    if args.workload == "repetitive":
        lens = [(8, 160), (12, 192), (8, 128), (16, 160)]
    elif args.workload == "longctx":
        if args.max_seq < 2048:
            sys.exit("--workload longctx needs --max-seq 2048")
        lens = [(1800, 64), (1500, 64), (1900, 48), (1600, 56)]

    def submit_all():
        for i in range(args.requests):
            plen, n = lens[i % len(lens)]
            prompt = [(j * 7 + i) % cfg.vocab_size for j in range(plen)]
            eng.submit(prompt, max_new_tokens=n)

    if args.workload == "replay":
        run_replay(args, eng, lens, cfg)
        return

    def one_run():
        s0 = eng._steps
        t0 = time.perf_counter()
        done = eng.run(steps_per_dispatch=args.steps_per_dispatch,
                       spec_k=args.spec_k)
        dt = time.perf_counter() - t0
        toks = sum(len(r.output_ids) for r in done.values())
        eng.finished.clear()
        return toks, eng._steps - s0, dt

    # warm pass: compiles every dispatch variant this flag combo uses
    # (multi-step / spec windows per attend bucket — the plain first
    # step alone leaves them to compile inside the timed region)
    submit_all()
    t0 = time.perf_counter()
    one_run()
    warm = time.perf_counter() - t0

    # steady-state pass: same mix, all programs compiled
    submit_all()
    toks, steps, dt = one_run()
    extra = ""
    if args.spec_k and hasattr(eng, "stats"):
        st = eng.stats()
        extra = (f" spec_windows={st['spec_windows']}"
                 f" accept_rate={st['spec_accept_rate']:.3f}"
                 f" ({st['spec_accepted']}/{st['spec_drafted']})")
    print(f"engine={args.engine} workload={args.workload} "
          f"requests={args.requests} tokens={toks} "
          f"steps={steps} wall={dt:.2f}s "
          f"aggregate={toks/dt:.1f} tok/s (warm pass {warm:.1f}s)"
          f"{extra}")


if __name__ == "__main__":
    main()
