"""CLI: generate text (or token ids) from a checkpoint or a demo model.

    python -m quantizations_tpu.serve --demo
    python -m quantizations_tpu.serve --model /path/to/hf_llama \
        --prompt "Hello" --max-new-tokens 60 [--quant-type nf4] [--tp 4]

Replaces the reference's README measurement script (reference
README.md:90-127) with a first-class entry point.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main() -> None:
    p = argparse.ArgumentParser(prog="quantizations_tpu.serve")
    p.add_argument("--model", help="HF checkpoint dir (config.json + "
                   "safetensors [+ tokenizer])")
    p.add_argument("--demo", action="store_true",
                   help="tiny random model, token-id I/O")
    p.add_argument("--prompt", default="The key to a fast TPU kernel is")
    p.add_argument("--prompt-ids", help="comma-separated token ids "
                   "(skips the tokenizer)")
    p.add_argument("--max-new-tokens", type=int, default=60)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--eos-id", type=int, default=None,
                   help="freeze a row to this id once emitted")
    p.add_argument("--quant-type", default="fp4", choices=["fp4", "nf4"])
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (devices on the mesh)")
    p.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding (greedy or "
                        "temperature sampling; single device)")
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"],
                   help="KV cache element type (int8 halves attention "
                        "HBM traffic at long context; single device)")
    p.add_argument("--pipeline", default="grid",
                   choices=["grid", "manual"],
                   help="decode-band pair-kernel weight streaming")
    p.add_argument("--engine", default="generate",
                   choices=["generate", "slot", "paged"],
                   help="generate = one jitted loop; slot/paged = "
                        "continuous-batching engines (single device; "
                        "';'-separate --prompt-ids for several "
                        "requests)")
    p.add_argument("--slots", type=int, default=4,
                   help="engine batch slots")
    p.add_argument("--spec-k", type=int, default=0,
                   help="engine speculative window (prompt-lookup "
                        "drafts, one verify dispatch per window)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="engine decode steps per device dispatch")
    p.add_argument("--prefix-cache", action="store_true",
                   help="paged engine: share full prompt-prefix pages "
                        "across requests")
    p.add_argument("--num-pages", type=int, default=0,
                   help="paged engine pool size (0 = slots*max_seq/"
                        "page_size + slack)")
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--fuse", action="store_true",
                   help="fuse qkv/gate_up projections (single-device "
                        "serving: 4 weight kernels per layer, not 7)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ..config import QuantConfig, ServeConfig
    from ..models.llama import KVCache, TINY_LLAMA, init_llama_params

    if args.tp > 1 and args.fuse:
        raise SystemExit("--fuse is single-device (TP shards the "
                         "unfused per-projection form)")
    quant = QuantConfig(quant_type=args.quant_type,
                        pair_pipeline=args.pipeline)
    serve = ServeConfig(
        max_seq_len=args.max_seq, max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_k=args.top_k,
        top_p=args.top_p, eos_id=args.eos_id,
    )

    tokenizer = None
    if args.demo or not args.model:
        cfg = dataclasses.replace(TINY_LLAMA, quant=quant,
                                  kv_cache_dtype=args.kv_dtype)
        params = init_llama_params(cfg, seed=0)
        serve = dataclasses.replace(serve, max_seq_len=min(args.max_seq, 128))
    else:
        from ..models.hf_loader import load_hf_llama

        mesh = None
        if args.tp > 1:
            from ..parallel import make_mesh

            mesh = make_mesh((args.tp,), ("tp",))
        cfg, params = load_hf_llama(args.model, quant=quant, mesh=mesh)
        cfg = dataclasses.replace(cfg, kv_cache_dtype=args.kv_dtype)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            tokenizer = None

    if args.fuse:
        from ..models.llama import fuse_projections

        params = fuse_projections(params)

    if args.prompt_ids:
        prompts = [[int(t) for t in grp.split(",")]
                   for grp in args.prompt_ids.split(";") if grp]
    elif tokenizer is not None:
        prompts = [tokenizer.encode(args.prompt)]
    else:
        prompts = [[1, 2, 3, 4, 5]]  # demo: raw ids

    if args.engine != "generate":
        if args.tp > 1 and not args.model:
            raise SystemExit("--engine with --tp needs --model "
                             "(mesh-placed params)")
        emesh = mesh if (args.tp > 1 and args.model) else None
        if args.engine == "slot":
            from .engine import Engine

            eng = Engine(params, cfg, serve, slots=args.slots,
                         temperature=serve.temperature,
                         top_k=serve.top_k, top_p=serve.top_p,
                         mesh=emesh)
        else:
            from .paged import PagedEngine

            psz = args.page_size
            npages = args.num_pages or (
                args.slots * -(-serve.max_seq_len // psz) + 8)
            eng = PagedEngine(
                params, cfg, num_pages=npages, page_size=psz,
                slots=args.slots, max_seq=serve.max_seq_len,
                temperature=serve.temperature, top_k=serve.top_k,
                top_p=serve.top_p, prefix_cache=args.prefix_cache,
                mesh=emesh)
        t0 = time.perf_counter()
        uids = [eng.submit(p_, max_new_tokens=args.max_new_tokens,
                           eos_id=args.eos_id,
                           temperature=args.temperature)
                for p_ in prompts]
        done = eng.run(spec_k=args.spec_k,
                       steps_per_dispatch=args.steps_per_dispatch)
        dt = time.perf_counter() - t0
        total = sum(len(done[u].output_ids) for u in uids)
        print(json.dumps({
            "engine": args.engine,
            "requests": [{
                "prompt_ids": p_,
                "output_ids": done[u].output_ids,
                "output_text": (tokenizer.decode(done[u].output_ids)
                                if tokenizer is not None else None),
            } for p_, u in zip(prompts, uids)],
            "wall_s": round(dt, 3),
            "tokens_per_s_incl_compile": round(total / dt, 2),
        }))
        return

    if args.tp > 1 and args.model:
        from jax.sharding import NamedSharding

        from ..parallel import make_sharded_generate_fn
        from ..parallel.shard import cache_pspec

        gen = make_sharded_generate_fn(cfg, serve, mesh)

        def mk_cache():
            return jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                KVCache.create(cfg, 1, serve.max_seq_len),
                cache_pspec(cfg))
    else:
        from .generate import make_generate_fn

        gen = make_generate_fn(cfg, serve)

        def mk_cache():
            return KVCache.create(cfg, 1, serve.max_seq_len)

    import numpy as np

    spec = None
    if args.speculative:
        if args.tp > 1:
            raise SystemExit("--speculative is single-device")
        from .speculative import make_speculative_generate_fn

        spec = make_speculative_generate_fn(cfg, serve)

    # every ';'-separated prompt group runs (sequentially — the plain
    # generate path is batch-1; use --engine slot/paged for concurrency)
    key = jax.random.PRNGKey(serve.seed)
    recs = []
    t0 = time.perf_counter()
    for ids in prompts:
        prompt = jnp.asarray([ids], jnp.int32)
        cache = mk_cache()   # fresh per prompt (gen donates its cache)
        key, sub = jax.random.split(key)
        tp0 = time.perf_counter()
        verify_steps = None
        if spec is not None:
            toks, steps, _ = spec(params, prompt, cache, sub)
            verify_steps = int(steps)
        else:
            toks, _ = gen(params, prompt, cache, sub)
        out = np.asarray(toks)[0].tolist()
        dt = time.perf_counter() - tp0
        rec = {
            "prompt_ids": ids,
            "output_ids": out,
            "output_text": (tokenizer.decode(out)
                            if tokenizer is not None else None),
            "wall_s": round(dt, 3),
            "tokens_per_s_incl_compile": round(len(out) / dt, 2),
        }
        if verify_steps is not None:
            rec["speculative_verify_steps"] = verify_steps
            rec["tokens_per_verify_step"] = round(
                len(out) / verify_steps, 2)
        recs.append(rec)
    if len(recs) == 1:
        print(json.dumps(recs[0]))
    else:
        total = sum(len(r["output_ids"]) for r in recs)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "requests": recs,
            "wall_s": round(dt, 3),
            "tokens_per_s_incl_compile": round(total / dt, 2),
        }))


if __name__ == "__main__":
    main()
