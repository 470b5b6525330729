"""Decompose the manual double-buffered FP4 pair kernel's 117.5us at
[14336,4096] T=1 (round-3 measurement: manual TIES grid at ~118us, so
the round-2 "no overlap" reading of the additive decomposition was
wrong — the DMA is already hidden and the kernel is COMPUTE-bound).

Variants (manual pipeline structure, tile_m selectable):

  dma_only     : DMA + bitcast + 1 MXU dot          -> DMA floor w/ overlap
  decode_only  : DMA + pair decode + xor-fold + 1 dot -> + decode cost
  decode_mm    : DMA + decode + 4 dots (no scales)   -> + per-plane dot cost
  full         : production matmul_4bit_pair_manual  -> + srep build/mult
  mixg1 / mixg2: FP4 gather-mix decode — planes 0(,2) through the
                 dynamic gather unit, remaining planes through the
                 byte-SWAR arithmetic restricted to the nibble planes
                 actually needed. The gather issues on a different port
                 than the VPU ALU ops, so if the kernel is VPU-bound the
                 mix trades ALU ops for concurrent gather traffic
                 (same mechanism that won NF4: pair_patterns_mix).

Exactness: mix variants are checked bit-identical to the production
kernel before timing.
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
    matmul_4bit_pair_pallas, matmul_4bit_pair_manual, planar_to_pair,
    pair_permute_activation, _pattern_table)
from quantizations_tpu.ops.gemv import pack_i32_rows, _take16_chunked
from quantizations_tpu.ops.lut import (fp4_pair_patterns_all,
                                        fp4_pair_patterns_mix)
from quantizations_tpu.quant.codebooks import FP4_CODE
from quantizations_tpu.utils.timing import time_scan_chain

M, K = 14336, 4096
FP4_RAW = tuple(12.0 * v for v in FP4_CODE)


def make_manual(mode, tm, gather_planes=()):
    """Build a manual-pipeline kernel variant."""
    K4 = K // 4
    nb_total = K // 64
    tm2 = tm // 2
    nchunk = M // tm
    has_tbl = mode.startswith("mix")

    def kern(wp_ref, xp_ref, s_ref, *rest):
        if has_tbl:
            tbl_ref, o_ref = rest
        else:
            tbl_ref, (o_ref,) = None, rest
        xs = [xp_ref[:, p, :].astype(jnp.bfloat16) for p in range(4)]
        tt = xs[0].shape[0]

        def scoped(wbuf, wsem):
            def dma(slot, ci):
                return pltpu.make_async_copy(
                    wp_ref.at[pl.ds(ci * tm2, tm2), :], wbuf.at[slot],
                    wsem.at[slot])

            dma(0, 0).start()

            def loop(ci, _):
                slot = jax.lax.rem(ci, 2)
                nslot = jax.lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < nchunk)
                def _():
                    dma(nslot, ci + 1).start()

                dma(slot, ci).wait()
                wp = wbuf[slot]
                if mode == "dma_only":
                    Wp = pltpu.bitcast(wp, jnp.bfloat16)
                    part = jax.lax.dot_general(
                        xs[0], Wp, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o_ref[:, pl.ds(ci * tm, tm)] = part
                    return 0
                if mode in ("decode_only", "decode_mm"):
                    Ds = fp4_pair_patterns_all(wp)
                    if mode == "decode_only":
                        fold = Ds[0] ^ Ds[1] ^ Ds[2] ^ Ds[3]
                        part = jax.lax.dot_general(
                            xs[0], pltpu.bitcast(fold, jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        part = jnp.zeros((tt, tm), jnp.float32)
                        for p in range(4):
                            part = part + jax.lax.dot_general(
                                xs[p], pltpu.bitcast(Ds[p], jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    o_ref[:, pl.ds(ci * tm, tm)] = part
                    return 0
                # mix variants: full numerics (srep + scale mult + 4 dots)
                s = s_ref[pl.ds(ci * tm, tm), :]
                sf = s.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 12.0)
                sp = pltpu.bitcast(sf, jnp.int32)
                srep = pltpu.bitcast(
                    pltpu.repeat(sp, K4 // nb_total, axis=1), jnp.bfloat16)
                tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
                Ds = fp4_pair_patterns_mix(wp, tbl128, gather_planes)
                part = jnp.zeros((tt, tm), jnp.float32)
                for p in range(4):
                    Wj = pltpu.bitcast(Ds[p], jnp.bfloat16) * srep
                    part = part + jax.lax.dot_general(
                        xs[p], Wj, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                o_ref[:, pl.ds(ci * tm, tm)] = part
                return 0

            jax.lax.fori_loop(0, nchunk, loop, 0)

        pl.run_scoped(
            scoped,
            wbuf=pltpu.VMEM((2, tm2, K4), jnp.int32),
            wsem=pltpu.SemaphoreType.DMA((2,)),
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if has_tbl:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    @jax.jit
    def run(wp2, scales, x):
        xp = pair_permute_activation(x)
        operands = [wp2, xp, scales]
        if has_tbl:
            operands.append(_pattern_table(FP4_RAW))
        return pl.pallas_call(
            kern, in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], M), jnp.float32),
        )(*operands)

    return run


def main():
    rng = np.random.default_rng(0)
    by = jnp.asarray(rng.integers(0, 256, (M, K // 2),
                                  dtype=np.int64).astype(np.int32))
    wpp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wpp)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    nbytes = wp2.nbytes + scales.nbytes

    ref = np.asarray(matmul_4bit_pair_pallas(wp2, scales, x,
                                             quant_type="fp4"))

    cases = [
        ("full_grid", jax.jit(functools.partial(
            matmul_4bit_pair_pallas, quant_type="fp4")), True),
        ("full_man512", jax.jit(functools.partial(
            matmul_4bit_pair_manual, quant_type="fp4", tile_m=512)), True),
    ]
    for tm in (512, 1024):
        for mode in ("dma_only", "decode_only", "decode_mm"):
            cases.append((f"{mode}_tm{tm}",
                          make_manual(mode, tm), False))
    # tm 256: the tm-512 mix variant misses the 16 MB scoped-vmem limit
    # by 76 KB (measured) — the gather table broadcast tips it over
    for tm in (256,):
        cases.append((f"mixg0_tm{tm}", make_manual("mixg1", tm, (0,)), True))
        cases.append((f"mixg02_tm{tm}",
                      make_manual("mixg2", tm, (0, 2)), True))
    # production grid kernel with the decode knob (what bench.py uses)
    for dec in ("mixg0", "mixg02"):
        cases.append((f"grid_{dec}", jax.jit(functools.partial(
            matmul_4bit_pair_pallas, quant_type="fp4", decode=dec)), True))

    for name, f, exact in cases:
        def call(xx, w, s):
            if name in ("full_grid", "full_man512"):
                return f(w, s, xx)
            return f(w, s, xx)
        out = np.asarray(f(wp2, scales, x))
        if exact:
            err = np.max(np.abs(out - ref))
            tag = f"maxerr {err:.1e}"
        else:
            tag = "(not numeric)"
        dt = time_scan_chain(lambda xx, w, s: f(w, s, xx), x,
                             iters=300, trials=2, consts=(wp2, scales))
        print(f"{name:16s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s {tag}",
              flush=True)


if __name__ == "__main__":
    main()
