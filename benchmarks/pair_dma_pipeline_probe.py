"""Manual double-buffered DMA pipeline vs the grid-pipelined pair
kernel (VERDICT #1/#3 attack).

Evidence motivating this: the grid kernel's measured time decomposes
EXACTLY additively (DMA floor 53.8us + affine decode 34.5us + subnormal
blend 30.2us = 118.5us at [14336,4096] T=1), i.e. the automatic Pallas
pipeline does NOT overlap the weight stream with the VPU decode at
these shapes.  The manual pipeline (ops/qmatmul.matmul_4bit_pair_manual:
weights in HBM, in-kernel fori_loop over M-chunks, two VMEM slots,
chunk i+1's DMA issued before chunk i's compute) should run at
max(DMA, compute) instead of the sum:
  FP4 target ~65us  (vs 118.5)  -> b1 decode est 70+ tok/s
  NF4 target ~145us (vs 199.5 mix / 247.4 planar) -> b1 est ~50 tok/s

  prod_fp4    : grid kernel matmul_4bit_pair_pallas
  man_fp4     : manual pipeline, tile_m in {256, 512}
  mix_nf4     : grid kernel with the new gather+tree mix decode
  man_nf4     : manual pipeline, NF4 mix decode
"""
import functools, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.ops.qmatmul import (
    matmul_4bit_pair_pallas, matmul_4bit_pair_manual, planar_to_pair)
from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.utils.timing import time_scan_chain

M, K = 14336, 4096


def main():
    rng = np.random.default_rng(0)
    by = jnp.asarray(rng.integers(0, 256, (M, K // 2),
                                  dtype=np.int64).astype(np.int32))
    wpp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wpp)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    nbytes = wp2.nbytes + scales.nbytes

    cases = []
    for qt in ("fp4", "nf4"):
        cases.append((f"prod_{qt}", jax.jit(functools.partial(
            matmul_4bit_pair_pallas, quant_type=qt))))
        # smaller grid tiles: if the measured DMA/compute serialization
        # is VMEM pressure disabling Mosaic's automatic double
        # buffering, halving the tile should overlap without manual DMA
        for tm in (256, 128):
            cases.append((f"grid_{qt}_tm{tm}", jax.jit(functools.partial(
                matmul_4bit_pair_pallas, quant_type=qt, tile_m=tm))))
        for tm in (512, 256):
            cases.append((f"man_{qt}_tm{tm}", jax.jit(functools.partial(
                matmul_4bit_pair_manual, quant_type=qt, tile_m=tm))))

    refs = {}
    for name, f in cases:
        qt = "nf4" if "nf4" in name else "fp4"
        out = np.asarray(f(wp2, scales, x))
        if qt not in refs:
            refs[qt] = out
        rel = (np.max(np.abs(out - refs[qt]))
               / (np.max(np.abs(refs[qt])) + 1e-9))
        dt = time_scan_chain(lambda xx, w, s: f(w, s, xx), x,
                             iters=300, trials=2, consts=(wp2, scales))
        print(f"{name:14s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s "
              f"(rel {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
