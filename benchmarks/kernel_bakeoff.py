"""Race GEMV kernel variants on real TPU hardware.

Decode is HBM-bandwidth bound: speed-of-light time per call is
(packed bytes + scale bytes + activation bytes) / HBM BW. This script
measures achieved GB/s for each (lut, group_mm, tile_m) variant at Llama3
decode shapes using the serialized scan-chain timer (naive timing loops
are unreliable through the tunneled runtime) and prints a ranked table.

    python benchmarks/kernel_bakeoff.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import quantizations_tpu.quant as q
from quantizations_tpu.ops import gemv_4bit_pallas, pack_i32_rows
from quantizations_tpu.utils.timing import time_scan_chain

HBM_GBPS = 819.0  # TPU v5e peak HBM bandwidth


def calibrate():
    a = jax.device_put(jnp.ones((64, 1024, 1024), jnp.float32))
    dt = time_scan_chain(
        lambda x: (a * (x[0, 0] + 2.0)).reshape(a.shape[0], -1)[:1, :8],
        jnp.zeros((1, 8), jnp.float32),
        iters=20,
    )
    gb = 2 * a.nbytes / 1e9
    print(f"calibration copy 256MB->256MB: {dt*1e6:.0f}us "
          f"-> {gb/dt:.0f} GB/s ({100*gb/dt/HBM_GBPS:.0f}% peak)")


def main():
    rng = np.random.default_rng(0)
    shapes = [(14336, 4096), (4096, 4096), (4096, 14336), (1024, 4096),
              (28672, 4096), (6144, 4096)]
    print(f"devices: {jax.devices()}")
    calibrate()
    for (M, K) in shapes:
        W = (rng.standard_normal((M, K)) * 0.02).astype(np.float32)
        packed, state = jax.jit(
            q.quantize_4bit, static_argnames=("blocksize", "quant_type",
                                              "compress_statistics")
        )(jnp.asarray(W), 64, "fp4", False)
        wp = jax.device_put(pack_i32_rows(packed, M, K))
        scales = jax.device_put(state.absmax.reshape(M, K // 64))
        x0 = jax.device_put(jnp.asarray(
            rng.standard_normal((1, K)).astype(np.float32)))
        bytes_touched = M * K // 2 + M * (K // 64) * 4 + K * 4 + M * 4
        sol_us = bytes_touched / HBM_GBPS / 1e3
        print(f"\n== M={M} K={K}  bytes={bytes_touched/1e6:.1f}MB "
              f"SOL={sol_us:.1f}us ==")
        results = []
        for lut in ("fp4_bits", "tree"):
            for group_mm in (True, False):
                for tile_m in (256, 512):
                    fn = lambda x: gemv_4bit_pallas(
                        wp, scales, x, quant_type="fp4", lut=lut,
                        tile_m=tile_m, group_mm=group_mm)
                    try:
                        dt = time_scan_chain(fn, x0, iters=50, trials=2)
                    except Exception as e:  # noqa: BLE001
                        msg = str(e).splitlines()[0][:80]
                        print(f"  {lut:9s} mm={group_mm:d} tm={tile_m:4d}  "
                              f"FAILED: {msg}")
                        continue
                    gbps = bytes_touched / dt / 1e9
                    results.append((dt, lut, group_mm, tile_m, gbps))
                    print(f"  {lut:9s} mm={group_mm:d} tm={tile_m:4d}  "
                          f"{dt*1e6:7.1f}us  {gbps:6.1f}GB/s "
                          f"({100*gbps/HBM_GBPS:.0f}% peak)")
        if results:
            best = min(results)
            print(f"  BEST: {best[1]} mm={best[2]} tm={best[3]} "
                  f"{best[0]*1e6:.1f}us {best[4]:.1f}GB/s")


if __name__ == "__main__":
    main()
