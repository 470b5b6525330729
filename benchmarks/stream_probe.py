"""Isolate the Pallas pipeline bottleneck: tile-size sweep, grid
dimension semantics, per-call overhead, and an XLA dense-matvec control.

    python benchmarks/stream_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from quantizations_tpu.utils.timing import time_scan_chain

HBM_GBPS = 819.0
M, K8 = 14336, 512  # int32 words of a [14336, 4096] packed weight


def stream_kernel(wp_ref, x_ref, o_ref):
    o_ref[0, :] = jnp.sum(wp_ref[:].astype(jnp.float32), axis=1) + x_ref[0, 0]


def make_stream(wp, tile_m, semantics=None):
    params = {}
    if semantics is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))

    def fn(x):
        return pl.pallas_call(
            stream_kernel,
            grid=(M // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, K8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_m), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, M), jnp.float32),
            **params,
        )(wp, x)

    return fn


def main():
    rng = np.random.default_rng(0)
    wp = jnp.asarray(rng.integers(-2**31, 2**31, (M, K8), dtype=np.int64)
                     .astype(np.int32))
    x0 = jnp.zeros((1, 1), jnp.float32)
    nbytes = wp.nbytes
    print(f"wp {wp.shape} = {nbytes/1e6:.1f}MB  SOL={nbytes/HBM_GBPS/1e3:.1f}us")

    for tile_m in (256, 512, 1024, 2048):
        for sem in (None, "arbitrary"):
            try:
                fn = make_stream(wp, tile_m, sem)
                dt = time_scan_chain(fn, x0, iters=50, trials=2)
                print(f"  stream tm={tile_m:5d} sem={str(sem):9s} "
                      f"{dt*1e6:8.1f}us  {nbytes/dt/1e9:6.1f} GB/s")
            except Exception as e:  # noqa: BLE001
                print(f"  stream tm={tile_m:5d} sem={str(sem):9s} "
                      f"FAILED: {str(e).splitlines()[0][:90]}")

    # two calls per chain iteration: per-call overhead shows as ~2x time
    fn1 = make_stream(wp, 512, None)

    def fn2(x):
        o = fn1(x)
        return fn1(x + o[0, :1].reshape(1, 1) * 1e-30)

    dt = time_scan_chain(fn2, x0, iters=50, trials=2)
    print(f"  stream x2 per iter:       {dt*1e6:8.1f}us "
          f"(per call {dt*1e6/2:.1f}us)")

    # XLA control: dense bf16 matvec of the same logical weight
    Wd = jnp.asarray(rng.standard_normal((M, 4096)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    xd = jnp.ones((1, 4096), jnp.bfloat16)

    def dense(x):
        return jax.lax.dot_general(x, Wd, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dt = time_scan_chain(dense, xd, iters=50, trials=2)
    print(f"  XLA dense bf16 matvec:    {dt*1e6:8.1f}us  "
          f"{Wd.nbytes/dt/1e9:6.1f} GB/s ({Wd.nbytes/1e6:.0f}MB)")


if __name__ == "__main__":
    main()
