"""Probe + race the "v3" scale path for the SWAR pair kernel.

The pair kernel's scale application costs ~43us of its 146us at
[14336,4096] (measured): ~24us for the bf16 multiply itself, ~17us
attributable to the srep operand (one-hot MXU expansion + fp32->bf16
cast + layout mismatch with the bitcast-produced weights).

v3 idea: reorder the pair word axis BLOCK-MAJOR (w' = r*NB + b, r =
position-in-block, b = block id). Then the per-word scale row is just
the per-block scale row tile-repeated (kc4/NB) times — buildable
in-kernel as

    sp    = bitcast(bf16 scales [TM, NB] -> int32 [TM/2, NB])  # row merge
    rep   = pltpu.repeat(sp, kc4 // NB, axis=1)
    srep  = bitcast(rep -> bf16 [TM, kc4])

no one-hot matmul, no iota, and srep comes out of the SAME bitcast
layout class as the decoded weights.

Step 1 probes the bf16->int32 (merge) bitcast direction; step 2 times
the v3 kernel against the production v2 kernel.

    python benchmarks/srep_repeat_probe.py
"""

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

from quantizations_tpu.ops.lut import fp4_pair_patterns
from quantizations_tpu.ops.qmatmul import planar_to_pair, _pick_tiles_pair
from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.utils.timing import time_scan_chain


def probe_merge_bitcast():
    import ml_dtypes

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 128)).astype(ml_dtypes.bfloat16))

    def k1(x_ref, o_ref):
        s32 = pltpu.bitcast(x_ref[:], jnp.int32)
        rep = pltpu.repeat(s32, 4, axis=1)
        o_ref[:] = pltpu.bitcast(rep, jnp.bfloat16)

    out = pl.pallas_call(
        k1,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.bfloat16),
    )(x)
    got = np.asarray(out)
    want = np.tile(np.asarray(x), (1, 4))
    ok = bool((got == want).all())
    print(f"merge-bitcast + repeat roundtrip exact: {ok}")
    return ok


def v2_to_v3(wp2):
    """v2 pair words -> block-major v3 order (w' = r*NB + b)."""
    M2, K4 = wp2.shape
    K8 = K4 // 2
    NB = K8 // 8
    E, O = wp2[:, :K8], wp2[:, K8:]
    Et = E.reshape(M2, NB, 8).swapaxes(-1, -2).reshape(M2, 8 * NB)
    Ot = O.reshape(M2, NB, 8).swapaxes(-1, -2).reshape(M2, 8 * NB)
    return jnp.concatenate([Et, Ot], axis=1)


def v3_permute_activation(x):
    T, K = x.shape
    K8 = K // 8
    NB = K // 64
    xa = x.reshape(T, K8, 8).swapaxes(1, 2)        # [T, 8, K8]
    xe = xa[:, :4, :].reshape(T, 4, NB, 8).swapaxes(-1, -2)
    xo = xa[:, 4:, :].reshape(T, 4, NB, 8).swapaxes(-1, -2)
    return jnp.concatenate([xe.reshape(T, 4, 8 * NB),
                            xo.reshape(T, 4, 8 * NB)], axis=2)


def make_v3(M, K):
    K4 = K // 4
    NB = K // 64

    def kern(wp_ref, xp_ref, s_ref, o_ref):
        wp = wp_ref[:]
        s = s_ref[:]
        tm2, kc4 = wp.shape
        tm = 2 * tm2
        k_id = pl.program_id(2)
        sf = s.astype(jnp.bfloat16) * jnp.bfloat16(1 / 12.)
        sp = pltpu.bitcast(sf, jnp.int32)               # [TM2, NB]
        rep = pltpu.repeat(sp, kc4 // NB, axis=1)        # [TM2, kc4]
        srep = pltpu.bitcast(rep, jnp.bfloat16)          # [TM, kc4]
        tt = xp_ref.shape[0]
        part = jnp.zeros((tt, tm), jnp.float32)
        for p in range(4):
            D = fp4_pair_patterns(wp, 4 * p)
            Wp = pltpu.bitcast(D, jnp.bfloat16)
            Wj = Wp * srep
            xj = xp_ref[:, p, :].astype(jnp.bfloat16)
            part = part + jax.lax.dot_general(
                xj, Wj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(k_id == 0)
        def _():
            o_ref[:] = part

        @pl.when(k_id != 0)
        def _():
            o_ref[:] = o_ref[:] + part

    @jax.jit
    def f(x, wp3, scales):
        T = x.shape[0]
        tile_m, kc4 = _pick_tiles_pair(M, K4, None)
        while kc4 % NB:
            kc4 //= 2  # v3 chunking needs NB | kc4
        xp = v3_permute_activation(x)
        return pl.pallas_call(
            kern,
            grid=(T, M // tile_m, K4 // kc4),
            in_specs=[
                pl.BlockSpec((tile_m // 2, kc4), lambda t, i, kq: (i, kq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, kc4), lambda t, i, kq: (t, 0, kq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, NB), lambda t, i, kq: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_m), lambda t, i, kq: (t, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
        )(wp3, xp, scales)

    return f


def main():
    print(f"devices: {jax.devices()}")
    if not probe_merge_bitcast():
        return
    from quantizations_tpu.ops.qmatmul import matmul_4bit_pair_pallas

    rng = np.random.default_rng(0)
    for (M, K) in [(14336, 4096), (4096, 14336)]:
        by = jnp.asarray(
            rng.integers(0, 256, (M, K // 2), dtype=np.int64)
            .astype(np.int32))
        wp2 = planar_to_pair(pack_i32_rows(by, M, K))
        wp3 = v2_to_v3(wp2)
        scales = jnp.asarray(rng.random((M, K // 64), np.float32))
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        nbytes = wp2.nbytes + scales.nbytes
        a = np.asarray(matmul_4bit_pair_pallas(wp2, scales, x))
        f3 = make_v3(M, K)
        b = np.asarray(f3(x, wp3, scales))
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f"M={M} K={K} v3 vs v2 rel: {rel:.2e}")
        for name, fn, w in [
            ("v2", lambda xx, ww, s: matmul_4bit_pair_pallas(ww, s, xx), wp2),
            ("v3", lambda xx, ww, s: f3(xx, ww, s), wp3),
        ]:
            dt = time_scan_chain(fn, x, iters=1000, trials=2,
                                 consts=(w, scales))
            print(f"  {name}: {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
