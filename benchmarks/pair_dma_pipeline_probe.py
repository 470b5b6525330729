"""Manual double-buffered DMA pipeline for the FP4 pair kernel.

Evidence motivating this probe: the production pair kernel's measured
time decomposes EXACTLY additively (DMA floor 53.8us + affine decode
34.5us + subnormal blend 30.2us = 118.5us measured), which means the
grid-level Pallas pipeline is NOT overlapping the weight stream with
the VPU decode.  A manual pipeline (weights in HBM/ANY space, in-kernel
fori_loop over M-chunks, two VMEM slots, async copies for chunk i+1
issued before computing chunk i) should run at max(DMA, compute) ~=
65us instead of the 118.5us sum.

Variants:
  prod    : production matmul_4bit_pair_pallas (grid pipeline)
  manual  : double-buffered manual pipeline, same decode (SWAR byte4)
  manual0 : manual pipeline with decode stubbed to a bitcast (floor —
            measures pipeline overhead vs the 53.8us grid floor)
"""
import functools, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.ops.qmatmul import (
    matmul_4bit_pair_pallas, planar_to_pair, pair_permute_activation)
from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.ops.lut import fp4_pair_patterns_all
from quantizations_tpu.utils.timing import time_scan_chain

M, K = 14336, 4096
K4 = K // 4
NB = K // 64
TM = 512            # rows per chunk
TM2 = TM // 2
NCHUNK = M // TM


def _decode_dot(wp, srep, xp, tt):
    part = jnp.zeros((tt, TM), jnp.float32)
    Ds = fp4_pair_patterns_all(wp)
    for p in range(4):
        Wp = pltpu.bitcast(Ds[p], jnp.bfloat16)
        Wj = Wp * srep
        xj = xp[:, p, :].astype(jnp.bfloat16)
        part = part + jax.lax.dot_general(
            xj, Wj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return part


def _nodecode_dot(wp, srep, xp, tt):
    part = jnp.zeros((tt, TM), jnp.float32)
    for p in range(4):
        Wp = pltpu.bitcast(wp, jnp.bfloat16)      # garbage bits: floor
        Wj = Wp * srep
        xj = xp[:, p, :].astype(jnp.bfloat16)
        part = part + jax.lax.dot_general(
            xj, Wj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return part


def make_manual(decode=True):
    body_fn = _decode_dot if decode else _nodecode_dot

    def kern(wp_ref, s_ref, xp_ref, o_ref):
        tt = xp_ref.shape[0]
        xp = xp_ref[:]

        def scoped(wbuf, sbuf, wsem, ssem):
            def start(slot, ci):
                pltpu.make_async_copy(
                    wp_ref.at[pl.ds(ci * TM2, TM2), :],
                    wbuf.at[slot], wsem.at[slot]).start()
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(ci * TM, TM), :],
                    sbuf.at[slot], ssem.at[slot]).start()

            def wait(slot, ci):
                pltpu.make_async_copy(
                    wp_ref.at[pl.ds(ci * TM2, TM2), :],
                    wbuf.at[slot], wsem.at[slot]).wait()
                pltpu.make_async_copy(
                    s_ref.at[pl.ds(ci * TM, TM), :],
                    sbuf.at[slot], ssem.at[slot]).wait()

            start(0, 0)

            def loop(ci, _):
                slot = jax.lax.rem(ci, 2)
                nslot = jax.lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < NCHUNK)
                def _():
                    start(nslot, ci + 1)

                wait(slot, ci)
                wp = wbuf[slot]
                s = sbuf[slot]
                sf = s.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 12.0)
                sp = pltpu.bitcast(sf, jnp.int32)
                srep = pltpu.bitcast(
                    pltpu.repeat(sp, K4 // NB, axis=1), jnp.bfloat16)
                part = body_fn(wp, srep, xp, tt)
                o_ref[:, pl.ds(ci * TM, TM)] = part
                return 0

            jax.lax.fori_loop(0, NCHUNK, loop, 0)

        pl.run_scoped(
            scoped,
            wbuf=pltpu.VMEM((2, TM2, K4), jnp.int32),
            sbuf=pltpu.VMEM((2, TM, NB), jnp.float32),
            wsem=pltpu.SemaphoreType.DMA((2,)),
            ssem=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def f(x, wp2, scales):
        T = x.shape[0]
        xp = pair_permute_activation(x)
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        )(wp2, scales, xp)

    return f


def main():
    rng = np.random.default_rng(0)
    by = jnp.asarray(rng.integers(0, 256, (M, K // 2),
                                  dtype=np.int64).astype(np.int32))
    wpp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wpp)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    nbytes = wp2.nbytes + scales.nbytes

    fprod = jax.jit(lambda xx, w, s: matmul_4bit_pair_pallas(w, s, xx))
    ref = np.asarray(fprod(x, wp2, scales))
    dt = time_scan_chain(lambda xx, w, s: fprod(xx, w, s), x,
                         iters=300, trials=2, consts=(wp2, scales))
    print(f"{'prod':8s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s",
          flush=True)

    for name, dec in (("manual", True), ("manual0", False)):
        f = make_manual(decode=dec)
        out = np.asarray(f(x, wp2, scales))
        rel = (np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
               if dec else float("nan"))
        dt = time_scan_chain(lambda xx, w, s: f(xx, w, s), x,
                             iters=300, trials=2, consts=(wp2, scales))
        print(f"{name:8s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s "
              f"(rel {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
