"""Sweep the fused GEMV kernel across Llama3-8B decode shapes with the
production defaults and report achieved bandwidth per shape.
(LUT/accum variants are raced separately in lut_probe.py.)

    python benchmarks/kernel_bakeoff.py
"""

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

# (M, K): q/o, k/v, gate/up, down, lm_head of Llama3-8B
SHAPES = [(4096, 4096), (1024, 4096), (14336, 4096), (4096, 14336),
          (128256, 4096)]


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    total_us = 0.0
    total_bytes = 0
    for (M, K) in SHAPES:
        wp = jnp.asarray(
            rng.integers(-2**31, 2**31, (M, K // 8), dtype=np.int64)
            .astype(np.int32))
        scales = jnp.asarray(rng.random((M, K // 64), np.float32))
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        nbytes = wp.nbytes + scales.nbytes
        fn = lambda xx, w, s: gemv_4bit_pallas(w, s, xx, quant_type="fp4")
        dt = time_scan_chain(fn, x, iters=1000, trials=2,
                             consts=(wp, scales))
        gbps = nbytes / dt / 1e9
        print(f"  M={M:6d} K={K:6d} {nbytes/1e6:7.1f}MB  {dt*1e6:8.1f}us "
              f"{gbps:6.1f} GB/s ({100*gbps/HBM_GBPS:.0f}% peak)")
        total_us += dt * 1e6
        total_bytes += nbytes

    print(f"  sum of measured shapes: {total_us:.0f}us "
          f"({total_bytes/1e6:.0f}MB)")


if __name__ == "__main__":
    main()
