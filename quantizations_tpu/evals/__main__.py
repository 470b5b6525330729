"""CLI: accuracy evaluations of a checkpoint.

    # logit/ppl parity of 4-bit vs dequantized-dense on random tokens
    python -m quantizations_tpu.evals --model <hf_dir> --parity

    # IFEval (requires the official input_data.jsonl + a tokenizer)
    python -m quantizations_tpu.evals --model <hf_dir> \
        --ifeval /path/to/input_data.jsonl --max-new-tokens 512

The reference's accuracy claim is a single external IFEval run
(reference README.md:28); this makes the comparison reproducible:
run --ifeval twice (once with --dequantized) and diff the scores.
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main() -> None:
    p = argparse.ArgumentParser(prog="quantizations_tpu.evals")
    p.add_argument("--model", required=False,
                   help="HF checkpoint dir; omit for the tiny demo model")
    p.add_argument("--quant-type", default="fp4", choices=["fp4", "nf4"])
    p.add_argument("--parity", action="store_true",
                   help="logit-parity report (quantized vs dequantized)")
    p.add_argument("--parity-control", action="store_true",
                   help="ALSO run the parity with the model-path arm in "
                        "dense-twin mode (both arms then use the SAME "
                        "dense weights; any disagreement is pure "
                        "implementation rounding — flash attention vs "
                        "the einsum reference, bf16 MXU passes — "
                        "amplified by the network exactly like "
                        "quantization error). On a RANDOM-weight deep "
                        "proxy this is the chaos floor the quantized "
                        "parity must be read against: random nets "
                        "amplify ANY per-layer perturbation "
                        "exponentially in depth, trained nets don't")
    p.add_argument("--parity-tokens", type=int, default=128)
    p.add_argument("--ifeval", help="path to IFEval input_data.jsonl")
    p.add_argument("--ifeval-proxy", action="store_true",
                   help="IFEval score parity on the proxy model: drive "
                        "the synthesized dataset (all 25 instruction "
                        "ids) through the Engine twice — 4-bit kernels "
                        "vs the in-jit dense twin — and diff the scores "
                        "(the reference's accuracy claim's shape, "
                        "reference README.md:25-28)")
    p.add_argument("--ifeval-slots", type=int, default=8)
    p.add_argument("--dequantized", action="store_true",
                   help="run IFEval on the dequantized bf16 twin instead")
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--proxy", action="store_true",
                   help="use the trained-distribution weight proxy "
                        "(heavy tails + channel-scale spread + outlier "
                        "channels) instead of i.i.d. Gaussian — the "
                        "accuracy stand-in when no real checkpoint can "
                        "exist in the environment")
    p.add_argument("--preset", default="tiny", choices=["tiny", "8b"],
                   help="model shape when no --model dir is given")
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"],
                   help="KV cache dtype for the quantized side — parity "
                        "then measures 4-bit weights + int8 KV jointly")
    args = p.parse_args()

    if args.ifeval_proxy:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        from .ifeval_proxy import run_ifeval_proxy

        print(json.dumps(run_ifeval_proxy(
            preset=args.preset, quant_type=args.quant_type,
            kv_dtype=args.kv_dtype, max_new_tokens=args.max_new_tokens,
            slots=args.ifeval_slots)))
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from ..config import QuantConfig, ServeConfig
    from ..models.llama import TINY_LLAMA, init_llama_params

    tokenizer = None
    if args.model:
        from ..models.hf_loader import load_hf_llama

        cfg, params = load_hf_llama(
            args.model, quant=QuantConfig(quant_type=args.quant_type))
        cfg = dataclasses.replace(cfg, kv_cache_dtype=args.kv_dtype)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            tokenizer = None
    else:
        from ..models.llama import LLAMA3_8B

        base = LLAMA3_8B if args.preset == "8b" else TINY_LLAMA
        cfg = dataclasses.replace(
            base, kv_cache_dtype=args.kv_dtype,
            quant=QuantConfig(quant_type=args.quant_type))
        params = init_llama_params(
            cfg, seed=0,
            dist="trained_proxy" if args.proxy else "normal")

    out = {}
    if args.parity or not args.ifeval:
        from .parity import logit_parity

        rng = np.random.default_rng(0)
        ids = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (1, args.parity_tokens)),
            jnp.int32)
        out["parity"] = logit_parity(params, cfg, ids).to_dict()
        if args.parity_control:
            twin_cfg = dataclasses.replace(
                cfg, quant=dataclasses.replace(cfg.quant,
                                               dense_twin=True))
            out["parity_control"] = logit_parity(
                params, twin_cfg, ids).to_dict()

    if args.ifeval:
        if tokenizer is None:
            raise SystemExit("--ifeval needs a tokenizer (HF checkpoint)")
        from ..models.llama import KVCache
        from ..serve.generate import make_generate_fn
        from .ifeval import evaluate

        if args.dequantized:
            from .parity import dequantized_params

            params = dequantized_params(params, cfg)

        serve = ServeConfig(max_seq_len=args.max_seq,
                            max_new_tokens=args.max_new_tokens)
        gen = make_generate_fn(cfg, serve)
        key = jax.random.PRNGKey(0)
        eos = tokenizer.eos_token_id

        def generate_fn(prompt: str) -> str:
            msgs = [{"role": "user", "content": prompt}]
            try:
                ids = tokenizer.apply_chat_template(
                    msgs, add_generation_prompt=True)
            except Exception:
                ids = tokenizer.encode(prompt)
            toks, _ = gen(params, jnp.asarray([ids], jnp.int32),
                          KVCache.create(cfg, 1, serve.max_seq_len), key)
            toks = np.asarray(toks)[0].tolist()
            if eos in toks:
                toks = toks[:toks.index(eos)]
            return tokenizer.decode(toks)

        dataset = [json.loads(l)
                   for l in open(args.ifeval) if l.strip()]
        out["ifeval"] = evaluate(generate_fn, dataset).to_dict()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
