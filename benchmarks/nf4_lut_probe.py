"""Race 4-bit LUT strategies inside the PRODUCTION decode kernel
(matmul_4bit_pallas, the MXU path) at T=1 on the big MLP shapes.

NF4 has no bit-arithmetic decode (arbitrary codebook), so it dispatches
to a gather (take16) or a select tree; this probe measures which wins in
the fused kernel on real hardware.

    python benchmarks/nf4_lut_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.ops.qmatmul import matmul_4bit_pallas
from quantizations_tpu.utils.timing import time_scan_chain

SHAPES = [(14336, 4096), (4096, 14336)]
VARIANTS = [("fp4", "fp4_bits"), ("fp4", "mix2"), ("fp4", "mix3"),
            ("fp4", "mix4"), ("nf4", "take16"), ("nf4", "tree"),
            ("nf4", "mix3"), ("nf4", "mix4"), ("nf4", "mix5")]


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for (M, K) in SHAPES:
        wp = jnp.asarray(
            rng.integers(-2**31, 2**31, (M, K // 8), dtype=np.int64)
            .astype(np.int32))
        scales = jnp.asarray(rng.random((M, K // 64), np.float32))
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        nbytes = wp.nbytes + scales.nbytes
        for qt, lut in VARIANTS:
            fn = lambda xx, w, s: matmul_4bit_pallas(
                w, s, xx, quant_type=qt, lut=lut)
            dt = time_scan_chain(fn, x, iters=1000, trials=2,
                                 consts=(wp, scales))
            gbps = nbytes / dt / 1e9
            print(f"  M={M:6d} K={K:6d} {qt}/{lut:9s} "
                  f"{dt*1e6:8.1f}us {gbps:6.1f} GB/s")


if __name__ == "__main__":
    main()
