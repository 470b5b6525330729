"""CLI: quantize an HF checkpoint offline and save it.

    python -m quantizations_tpu.convert --model /path/to/hf_llama \
        --out /path/to/out --format bnb [--quant-type nf4]

Formats:
- ``bnb``    — HF directory in the bitsandbytes flat-key serialization
  (reference core.py:29-42 ``valid_qs_keys``): loadable by HF +
  bitsandbytes on GPU and by ``load_hf_llama`` here (packed codes taken
  verbatim, no re-quantization).
- ``native`` — single safetensors file in the runtime layout
  (``save_quantized``; fastest reload via ``load_quantized``).

The reference quantizes lazily at every load (core.py:139-161); this
tool amortizes that one-time cost into an artifact.

Note: a ``scales_dtype="bf16x2"`` source exports its bf16-rounded
RUNTIME scales (widened to fp32), not re-derived fp32 absmax — bnb
exports are faithful to the model-as-served, not bit-stable across the
scales_dtype knob (see ``save_bnb_checkpoint``).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser(prog="quantizations_tpu.convert")
    p.add_argument("--model", required=True,
                   help="source HF checkpoint dir (dense or bnb)")
    p.add_argument("--out", required=True, help="output path/dir")
    p.add_argument("--format", default="bnb",
                   choices=["bnb", "native"])
    p.add_argument("--quant-type", default="fp4",
                   choices=["fp4", "nf4"],
                   help="codebook for quantizing a DENSE source; a "
                        "pre-quantized bnb source dictates its own "
                        "stored type (this flag is then ignored)")
    p.add_argument("--no-double-quant", action="store_true",
                   help="store fp32 absmax instead of bnb's nested "
                        "8-bit statistics (exact round-trip, +1.5%% "
                        "size)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from .config import QuantConfig
    from .models.hf_loader import (load_hf_llama, save_bnb_checkpoint,
                                   save_quantized)

    quant = QuantConfig(quant_type=args.quant_type)
    t0 = time.perf_counter()
    cfg, params = load_hf_llama(args.model, quant=quant)
    t1 = time.perf_counter()
    if args.format == "bnb":
        save_bnb_checkpoint(
            params, cfg, args.out,
            compress_statistics=not args.no_double_quant)
        out = os.path.join(args.out, "model.safetensors")
    else:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_quantized(params, args.out)
        out = args.out
    t2 = time.perf_counter()
    print(json.dumps({
        "format": args.format,
        # the EFFECTIVE type: a bnb source overrides --quant-type
        "quant_type": cfg.quant.quant_type,
        "out": out,
        "bytes": os.path.getsize(out),
        "load_quantize_s": round(t1 - t0, 2),
        "save_s": round(t2 - t1, 2),
    }))


if __name__ == "__main__":
    main()
