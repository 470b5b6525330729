"""Race FP4 pair-decode variants inside the production pair kernel.

The pair kernel is VPU-bound: fp4_pair_patterns costs ~20 VPU ops per
(shift, word) = ~80 ops/word for 8 codes, which predicts the measured
131us at [14336,4096] (7.34M words x 80 ops / ~4 T ops/s).  Variants:

  v0_current   : fp4_pair_patterns as shipped (~20 ops/shift)
  v1_cheapmask : shared nibble-SWAR zero-mask + multiply expansion
                 (~18 ops/shift + 3 shared)
  v2_byteswar  : byte-SWAR redesign: compute the pattern's high byte
                 R = P>>7 and mantissa bit for ALL 8 codes in byte
                 fields (2 passes of 4), then cheap 16-bit assembly
                 (~65 ops/word total)
  f_affine     : floor probe - affine-only decode, WRONG for subnormal
                 codes (measures the cost of the subnormal blend)
  f_bitcast    : floor probe - decode = raw word bits (1 op), WRONG
                 values (measures the non-decode kernel floor: DMA,
                 MXU, srep, pipeline)

Exactness of v1/v2 vs fp4_pair_patterns is asserted on CPU over all
65536 (even,odd) code pairs before timing.
"""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.ops.qmatmul import (
    _pick_tiles_pair, planar_to_pair, pair_permute_activation)
from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.ops.lut import fp4_pair_patterns
from quantizations_tpu.utils.timing import time_scan_chain


# ---------------------------------------------------------------- variants
def v0_current(words):
    return [fp4_pair_patterns(words, 4 * p) for p in range(4)]


def v1_cheapmask(words):
    # shared: per-nibble bit3 = [e != 0] (e2 in {0,2,4,6}; +6 carries
    # into bit 3 iff e2 >= 2)
    Z = ((words & 0x66666666) + 0x66666666) & jnp.int32(0x88888888 - (1 << 32))
    outs = []
    for p in range(4):
        sh = 4 * p
        pair = (words >> sh) & 0x000F000F
        t1 = pair & 0x00010001
        t2 = pair & 0x00060006
        sgn = pair & 0x00080008
        affine = (0x41804180 + (t1 << 6)) - (t2 << 6)
        e0pat = t1 * 0x3D80
        mz = (Z >> (sh + 3)) & 0x00010001
        mask = (mz << 16) - mz
        bits = e0pat ^ ((e0pat ^ affine) & mask)
        outs.append(bits | (sgn << 12))
    return outs


_I32 = lambda v: jnp.int32(np.uint32(v).astype(np.int32))


def v2_byteswar(words):
    # byte-field planes: R = P >> 7 (pattern high byte), mb = mantissa
    # bit, sg = sign bit-3, for 4 codes per pass
    N0 = words & 0x0F0F0F0F
    N1 = (words >> 4) & 0x0F0F0F0F
    planes = []
    for N in (N0, N1):
        m = N & 0x01010101
        e2 = N & 0x06060606
        sg = N & _I32(0x08080808)
        e1 = e2 >> 1
        Rn = _I32(0x83838383) - e1          # 131 - e per byte
        # bit0 per byte iff e != 0 (mask AFTER the shift: bit31 would
        # sign-extend through an arithmetic >>)
        zb = ((e2 + 0x7E7E7E7E) >> 7) & 0x01010101
        zm = zb * 0xFF                      # 0xFF per byte iff normal
        Rs = m * 0x7B                       # 123 iff subnormal m=1
        R = Rs ^ ((Rs ^ Rn) & zm)
        mb = m & zm
        planes.append((R, mb, sg))
    outs = []
    for p in range(4):
        R, mb, sg = planes[p & 1]
        if p < 2:   # bytes 0, 2
            out = ((R & 0x00FF00FF) << 7) \
                | ((mb & 0x00010001) << 6) \
                | ((sg & 0x00080008) << 12)
        else:       # bytes 1, 3
            out = (((R >> 8) & 0x00FF00FF) << 7) \
                | ((mb & 0x01000100) >> 2) \
                | ((sg & _I32(0x08000800)) << 4)
        outs.append(out)
    return outs


def f_affine(words):
    outs = []
    for p in range(4):
        pair = (words >> (4 * p)) & 0x000F000F
        t1 = pair & 0x00010001
        t2 = pair & 0x00060006
        sgn = pair & 0x00080008
        affine = (0x41804180 + (t1 << 6)) - (t2 << 6)
        outs.append(affine | (sgn << 12))
    return outs


def f_bitcast(words):
    return [words, words >> 1, words >> 2, words >> 3]


VARIANTS = dict(v0_current=v0_current, v1_cheapmask=v1_cheapmask,
                v2_byteswar=v2_byteswar, f_affine=f_affine,
                f_bitcast=f_bitcast)


# ------------------------------------------------------- CPU exactness
def check_exact(name, fn):
    ev, od = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    # random full words + all (even,odd) pairs at every shift

    @jax.jit
    def diff():
        bad = jnp.int32(0)
        rng = np.random.default_rng(7)
        wr = jnp.asarray(rng.integers(-2**31, 2**31, (64, 128),
                                      dtype=np.int64).astype(np.int32))
        outs_r = fn(wr)
        for p in range(4):
            w = ((ev.astype(np.int64) << (4 * p))
                 | (od.astype(np.int64) << (16 + 4 * p)))
            wj = jnp.asarray(w.astype(np.uint32).astype(np.int32))
            bad += jnp.sum(fp4_pair_patterns(wj, 4 * p) != fn(wj)[p])
            bad += jnp.sum(fp4_pair_patterns(wr, 4 * p) != outs_r[p])
        return bad

    ok = int(diff()) == 0
    print(f"{name}: exact={ok}", flush=True)
    return ok


# ------------------------------------------------------------ kernel race
M, K = 14336, 4096
K4 = K // 4
NB = K // 64


def make_fn(decode, tile_m=None):
    def kern(wp_ref, xp_ref, s_ref, o_ref, *, kc4):
        wp = wp_ref[:]
        s = s_ref[:]
        tm2 = wp.shape[0]
        tm = 2 * tm2
        k_id = pl.program_id(2)
        sf = s.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 12.0)
        sp = pltpu.bitcast(sf, jnp.int32)
        srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // NB, axis=1),
                             jnp.bfloat16)
        tt = xp_ref.shape[0]
        part = jnp.zeros((tt, tm), jnp.float32)
        Ds = decode(wp)
        for p in range(4):
            Wp = pltpu.bitcast(Ds[p], jnp.bfloat16)
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
    def f(x, wp2, scales):
        T = x.shape[0]
        tm, kc4 = _pick_tiles_pair(M, K4, tile_m)
        xp = pair_permute_activation(x)
        return pl.pallas_call(
            functools.partial(kern, kc4=kc4),
            grid=(T, M // tm, K4 // kc4),
            in_specs=[
                pl.BlockSpec((tm // 2, kc4), lambda t, i, kq: (i, kq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, kc4), lambda t, i, kq: (t, 0, kq),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, NB), lambda t, i, kq: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tm), lambda t, i, kq: (t, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
        )(wp2, xp, scales)

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

    ref = None
    todo = sys.argv[1:] or list(VARIANTS)
    extra_tiles = {"v2_byteswar": (512,)}
    for name in todo:
        fn = VARIANTS[name]
        for tm in (None,) + extra_tiles.get(name, ()):
            f = make_fn(fn, tile_m=tm)
            out = np.asarray(f(x, wp2, scales))
            tag = name + (f"_tm{tm}" if tm else "")
            if name == "v0_current":
                ref = out
            elif ref is not None and not name.startswith("f_"):
                rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
                print(f"{tag}: rel vs v0 = {rel:.2e}", flush=True)
            dt = time_scan_chain(lambda xx, w, s: f(xx, w, s), x,
                                 iters=300, trials=2, consts=(wp2, scales))
            print(f"{tag:24s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    for name, fn in VARIANTS.items():
        if not name.startswith("f_"):
            if not check_exact(name, fn):
                raise SystemExit(f"{name} NOT exact")
    main()
