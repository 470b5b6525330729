"""Race the production fused-GEMV kernel's LUT strategies + accum modes
on real hardware at Llama3 decode shapes.

    python benchmarks/lut_probe.py [--M 14336] [--K 4096]
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

from quantizations_tpu.ops.gemv import gemv_4bit_pallas
from quantizations_tpu.utils.timing import time_scan_chain

HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=14336)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--quant-type", default="fp4")
    ap.add_argument("--tile-m", type=int, default=256)
    args = ap.parse_args()
    M, K = args.M, args.K

    rng = np.random.default_rng(0)
    wp = jnp.asarray(rng.integers(-2**31, 2**31, (M, K // 8), dtype=np.int64)
                     .astype(np.int32))
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    nbytes = wp.nbytes + scales.nbytes
    print(f"M={M} K={K} qt={args.quant_type} bytes={nbytes/1e6:.1f}MB "
          f"SOL={nbytes/HBM_GBPS/1e3:.1f}us")

    ref = None
    variants = ["fp4_bits", "tree", "take16"]
    for lut in variants:
        accum = ""
        try:
            fn = lambda xx, l=lut: gemv_4bit_pallas(
                wp, scales, xx, quant_type=args.quant_type, lut=l,
                tile_m=args.tile_m)
            out = np.asarray(fn(x))
            if ref is None:
                ref = out
            else:
                err = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-2))
                print(f"    [{lut}/{accum}] max rel delta vs first: "
                      f"{err:.2e}")
            dt = time_scan_chain(fn, x, iters=2000, trials=2)
            print(f"  {lut:9s}/{accum:4s} {dt*1e6:8.1f}us  "
                  f"{nbytes/dt/1e9:6.1f} GB/s "
                  f"({100*nbytes/dt/1e9/HBM_GBPS:.0f}% peak)")
        except Exception as e:  # noqa: BLE001
            msg = (str(e).splitlines() or ["?"])[0][:100]
            print(f"  {lut:9s}/{accum:4s} FAILED: {msg}")


if __name__ == "__main__":
    main()
