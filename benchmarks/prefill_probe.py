"""Prefill tuning probe (VERDICT #5): race the dense-pair XLA path
against the fused pair kernel at prefill shapes.

The dense path (`dense_matmul_pair`) materializes the dequantized
weight through HBM every call (~263 MB of traffic per [14336,4096]
projection vs 60 GFLOP of dot at T=512) — the measured 31% prefill MFU
is that materialization, not the MXU.  The fused pair kernel never
materializes; at large tile_t the in-VMEM decode amortizes over the
token tile.  Also races a t-INNER grid variant (weights fetched once
per M-tile instead of once per t-tile).

  dense      : production dense_matmul_pair
  pair_tN    : matmul_4bit_pair_pallas, tile_t = N (t outermost)
  pairin_tN  : t innermost grid (i, kq, t) — weights stream once

Usage: python benchmarks/prefill_probe.py [T ...]
"""
import functools, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.nn.linear import dense_matmul_pair
from quantizations_tpu.ops.qmatmul import (
    matmul_4bit_pair_pallas, planar_to_pair, pair_permute_activation,
    _pick_tiles_pair, _pair_fn)
from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.utils.timing import time_scan_chain

SHAPES = [(14336, 4096), (4096, 14336)]
PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s


def make_pair_inner(M, K, T, tile_t, tile_m=None):
    """t-INNER grid (i, kq, t): the weight block changes only when kq
    advances, so each weight word is fetched once per M-tile instead of
    once per t-tile.  The output block must then span ALL T rows of the
    M-tile (index map (0, i)) — a (t, i) block would be revisited
    non-consecutively across kq and Pallas drops the accumulation
    (measured rel 9.6e-01 at [4096,14336], chain_r3b)."""
    K4 = K // 4
    tile_m, kc4 = _pick_tiles_pair(M, K4, tile_m, tile_t, 2)
    # whole-T output block: keep it within ~2 MB
    while tile_m > 128 and T * tile_m * 4 > 2 * 2**20:
        tile_m //= 2
    pair_fn, out_factor, _ = _pair_fn("fp4")
    NBtot = K // 64

    def kern(wp_ref, xp_ref, s_ref, o_ref):
        wp = wp_ref[:]
        s = s_ref[:]
        tm = 2 * wp.shape[0]
        k_id = pl.program_id(1)
        t_id = pl.program_id(2)
        sf = s.astype(jnp.bfloat16)
        if out_factor != 1.0:
            sf = sf * jnp.bfloat16(out_factor)
        sp = pltpu.bitcast(sf, jnp.int32)
        srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // NBtot, axis=1),
                             jnp.bfloat16)
        tt = xp_ref.shape[0]
        part = jnp.zeros((tt, tm), jnp.float32)
        Ds = pair_fn(wp)
        for p in range(4):
            Wp = pltpu.bitcast(Ds[p], jnp.bfloat16)
            Wj = Wp * srep
            xj = xp_ref[:, p, :].astype(jnp.bfloat16)
            part = part + jax.lax.dot_general(
                xj, Wj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        rows = pl.ds(t_id * tt, tt)

        @pl.when(k_id == 0)
        def _():
            o_ref[rows, :] = part

        @pl.when(k_id != 0)
        def _():
            o_ref[rows, :] = o_ref[rows, :] + part

    @jax.jit
    def f(x, wp2, scales):
        xp = pair_permute_activation(x)
        return pl.pallas_call(
            kern,
            grid=(M // tile_m, K4 // kc4, T // tile_t),
            in_specs=[
                pl.BlockSpec((tile_m // 2, kc4),
                             lambda i, kq, t: (i, kq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, 4, kc4),
                             lambda i, kq, t: (t, 0, kq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, NBtot),
                             lambda i, kq, t: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, tile_m),
                                   lambda i, kq, t: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
        )(wp2, xp, scales)

    return f


def run_shape(M, K, Ts):
    rng = np.random.default_rng(0)
    by = jnp.asarray(rng.integers(0, 256, (M, K // 2),
                                  dtype=np.int64).astype(np.int32))
    wpp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wpp)
    scales = jnp.asarray((rng.random((M, K // 64), np.float32)
                          * 0.05 + 0.01).astype(np.float32))

    for T in Ts:
        x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)
                        * 0.1)
        xb = x.astype(jnp.bfloat16)   # production hands the kernel bf16
        flops = 2.0 * T * M * K

        fd = jax.jit(functools.partial(
            dense_matmul_pair, quant_type="fp4"))
        ref = np.asarray(fd(x, wp2, scales))
        dt = time_scan_chain(lambda xx, w, s: fd(xx, w, s), x,
                             iters=50, trials=2, consts=(wp2, scales))
        print(f"[{M},{K}] T={T:5d} dense      {dt*1e6:9.1f}us "
              f"MFU {flops/dt/PEAK_BF16*100:5.1f}%", flush=True)

        for tile_t in (128, 256, 512):
            if T % tile_t:
                continue
            fp_ = jax.jit(functools.partial(
                matmul_4bit_pair_pallas, tile_t=tile_t))
            try:
                out = np.asarray(fp_(wp2, scales, xb))
            except Exception as e:   # oversized-tile scoped-VMEM OOM
                print(f"[{M},{K}] T={T:5d} pair_t{tile_t:<4d} "
                      f"FAILED ({type(e).__name__})", flush=True)
                continue
            rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            dt = time_scan_chain(
                lambda xx, w, s: fp_(w, s, xx), xb,
                iters=50, trials=2, consts=(wp2, scales))
            print(f"[{M},{K}] T={T:5d} pair_t{tile_t:<4d} {dt*1e6:9.1f}us "
                  f"MFU {flops/dt/PEAK_BF16*100:5.1f}% (rel {rel:.1e})",
                  flush=True)

            fi = make_pair_inner(M, K, T, tile_t)
            try:
                out = np.asarray(fi(xb, wp2, scales))
            except Exception as e:
                print(f"[{M},{K}] T={T:5d} pairin_t{tile_t:<4d} "
                      f"FAILED ({type(e).__name__})", flush=True)
                continue
            rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            dt = time_scan_chain(lambda xx, w, s: fi(xx, w, s), xb,
                                 iters=50, trials=2, consts=(wp2, scales))
            print(f"[{M},{K}] T={T:5d} pairin_t{tile_t:<4d} {dt*1e6:7.1f}us "
                  f"MFU {flops/dt/PEAK_BF16*100:5.1f}% (rel {rel:.1e})",
                  flush=True)


if __name__ == "__main__":
    Ts = [int(a) for a in sys.argv[1:]] or [512, 2048]
    for M, K in SHAPES:
        run_shape(M, K, Ts)
