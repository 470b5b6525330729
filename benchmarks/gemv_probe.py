"""Kernel-design ladder: isolate where the fused GEMV time goes.

Runs a sequence of increasingly complete Pallas kernels over the same
packed weights and prints achieved GB/s for each rung:

  stream   : read wp tiles, write per-tile row sums (pure DMA/pipeline)
  extract  : + unpack all 8 nibble planes (shift/and), sum them
  decode   : + fp4_bits LUT to fp32 values
  scaled   : + per-block scale multiply
  mxu      : full GEMV — decode to bf16 planes, MXU dot with activation
  plane_fma: full GEMV — per-plane VPU fma (the current ops/gemv.py)

    python benchmarks/gemv_probe.py --M 14336 --K 4096
"""

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.ops.gemv import (
    _SHIFTS,
    gemv_4bit_pallas,
    pack_i32_rows,
    permute_activation,
)
from quantizations_tpu.ops.lut import lut_fp4_bits
from quantizations_tpu.utils.timing import time_scan_chain

HBM_GBPS = 819.0


def probe_kernel(mode):
    def kernel(wp_ref, xp_ref, s_ref, o_ref):
        wp = wp_ref[:]
        if mode == "stream":
            o_ref[0, :] = jnp.sum(wp.astype(jnp.float32), axis=1)
            return
        acc = jnp.zeros(wp.shape, jnp.float32)
        for j in range(8):
            codes = (wp >> _SHIFTS[j]) & 15
            if mode == "extract":
                acc = acc + codes.astype(jnp.float32)
            else:
                vals = lut_fp4_bits(codes)
                if mode == "decode":
                    acc = acc + vals
                else:  # scaled
                    acc = acc + vals * xp_ref[0, j, :][None, :]
        if mode == "scaled":
            srep = pltpu.repeat(s_ref[:], 8, axis=1)
            acc = acc * srep
        o_ref[0, :] = jnp.sum(acc, axis=1)

    return kernel


def _take16(codes, table):
    tbl = jnp.asarray(np.asarray(table, np.float32))
    return jnp.take(tbl, codes, axis=0)


def mxu_kernel(wp_ref, xp_ref, s_ref, o_ref, *, lut=lut_fp4_bits):
    """Decode to bf16 planes, concat -> [TM, K] (permuted layout), MXU
    matvec against the (permuted) activation."""
    wp = wp_ref[:]
    srep = pltpu.repeat(s_ref[:], 8, axis=1)  # [TM, K8]
    planes = []
    for j in range(8):
        codes = (wp >> _SHIFTS[j]) & 15
        planes.append((lut(codes) * srep).astype(jnp.bfloat16))
    W = jnp.concatenate(planes, axis=1)          # [TM, K] permuted
    x = xp_ref[:].reshape(1, -1).astype(jnp.bfloat16)  # [1, K] permuted
    o_ref[:] = jax.lax.dot_general(
        x, W, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [1, TM]


FP4_TBL = tuple(
    float(v) for v in
    __import__("quantizations_tpu.quant.codebooks",
               fromlist=["FP4_CODE"]).FP4_CODE)


def mxu_take_kernel(wp_ref, xp_ref, s_ref, o_ref):
    mxu_kernel(wp_ref, xp_ref, s_ref, o_ref,
               lut=lambda c: _take16(c, FP4_TBL))


def run_probe(wp, xp, scales, mode, tile_m):
    M, K8 = wp.shape
    if mode == "mxu":
        kern = mxu_kernel
    elif mode == "mxu_take":
        kern = mxu_take_kernel
    else:
        kern = probe_kernel(mode)
    return pl.pallas_call(
        kern,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, K8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, K8 // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, M), jnp.float32),
    )(wp, xp, scales)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=14336)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--tile-m", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    M, K = args.M, args.K

    rng = np.random.default_rng(0)
    wp = jnp.asarray(
        rng.integers(-2**31, 2**31, (M, K // 8), dtype=np.int64)
        .astype(np.int32))
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    xp = permute_activation(x)
    nbytes = wp.nbytes + scales.nbytes
    sol = nbytes / HBM_GBPS / 1e9
    print(f"M={M} K={K} tile_m={args.tile_m} bytes={nbytes/1e6:.1f}MB "
          f"SOL={sol*1e6:.1f}us  devices={jax.devices()}")

    for mode in ["stream", "extract", "decode", "scaled", "mxu", "mxu_take"]:
        try:
            fn = lambda xpp: run_probe(wp, xpp, scales, mode, args.tile_m)
            dt = time_scan_chain(fn, xp, iters=args.iters, trials=2)
            print(f"  {mode:9s} {dt*1e6:8.1f}us  {nbytes/dt/1e9:6.1f} GB/s "
                  f"({100*nbytes/dt/1e9/HBM_GBPS:.0f}% peak)")
        except Exception as e:  # noqa: BLE001
            print(f"  {mode:9s} FAILED: {str(e).splitlines()[0][:100]}")

    # current production kernel for reference
    fn = lambda xx: gemv_4bit_pallas(wp, scales, xx, quant_type="fp4",
                                     tile_m=args.tile_m)
    dt = time_scan_chain(fn, x, iters=args.iters, trials=2)
    print(f"  plane_fma {dt*1e6:8.1f}us  {nbytes/dt/1e9:6.1f} GB/s "
          f"({100*nbytes/dt/1e9/HBM_GBPS:.0f}% peak)")


if __name__ == "__main__":
    main()
