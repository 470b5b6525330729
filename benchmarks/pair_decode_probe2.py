"""FP4 pair-decode golf, round 2. Baseline: fp4_pair_patterns_all
(byte-SWAR, 119.0us at [14336,4096] T=1; affine-only floor 88.3us,
no-decode floor 53.8us — benchmarks/pair_decode_probe.py).

  v2   : production fp4_pair_patterns_all (2 int32 muls per byte pass)
  v2b  : mul-free — zm via (zb<<8)-zb, Rs via shift-subs (int32
         multiplies are multi-pass on the VPU; shifts are single)
  v2c  : v2b + assembly golf (sign folded through the mb plane)
  mixg : shifts 0-2 arithmetic (per-shift SWAR) + shift 3 via the
         dual per-half int32-pattern gather — probes whether Mosaic
         dual-issues the gather unit with VPU ALU ops
"""
import functools, sys
import numpy as np
import jax, jax.numpy as jnp
import ml_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.ops.qmatmul import (
    _pick_tiles_pair, planar_to_pair, pair_permute_activation)
from quantizations_tpu.ops.gemv import pack_i32_rows, _take16_chunked
from quantizations_tpu.ops.lut import (
    fp4_pair_patterns, fp4_pair_patterns_all)
from quantizations_tpu.utils.timing import time_scan_chain

M, K = 14336, 4096
K4 = K // 4
NB = K // 64

_I32 = lambda v: jnp.int32(np.uint32(v & 0xFFFFFFFF).astype(np.int32))

# raw FP4 pattern table (codebook x 12) as bf16 bit patterns, for the
# gather variant
from quantizations_tpu.quant.codebooks import FP4_CODE
RAW = np.asarray(np.asarray(FP4_CODE, np.float32) * 12.0).astype(
    ml_dtypes.bfloat16).view(np.uint16).astype(np.int64)
TBL = np.zeros((1, 256), np.int32)
TBL[0, :16] = RAW.astype(np.int32)
TBLJ = jnp.asarray(TBL)


def v2(words):
    return fp4_pair_patterns_all(words)


def _byte_planes_mulfree(words):
    N0 = words & 0x0F0F0F0F
    N1 = (words >> 4) & 0x0F0F0F0F
    planes = []
    for N in (N0, N1):
        m = N & 0x01010101
        e2 = N & 0x06060606
        sg = N & 0x08080808
        e1 = e2 >> 1
        Rn = _I32(0x83838383) - e1
        zb = ((e2 + 0x7E7E7E7E) >> 7) & 0x01010101
        zm = (zb << 8) - zb                  # 0xFF per byte iff normal
        Rs = ((m << 7) - (m << 2)) - m       # 123 per byte iff m
        R = Rs ^ ((Rs ^ Rn) & zm)
        mb = m & zm
        planes.append((R, mb, sg))
    return planes


def v2b(words):
    planes = _byte_planes_mulfree(words)
    outs = []
    for p in range(4):
        R, mb, sg = planes[p & 1]
        if p < 2:
            out = ((R & 0x00FF00FF) << 7) \
                | ((mb & 0x00010001) << 6) \
                | ((sg & 0x00080008) << 12)
        else:
            out = (((R >> 8) & 0x00FF00FF) << 7) \
                | ((mb & 0x01000100) >> 2) \
                | ((sg & 0x08000800) << 4)
        outs.append(out)
    return outs


def v2c(words):
    # fold mb and sg into ONE auxiliary byte plane G = mb | sg before
    # the per-output selection (1 shared op replaces nothing per se,
    # but the per-output masks select from a single plane -> fewer live
    # vregs; measure whether Mosaic schedules it better)
    planes = _byte_planes_mulfree(words)
    outs = []
    for p in range(4):
        R, mb, sg = planes[p & 1]
        G = mb | sg
        if p < 2:
            sel = G & 0x00090009
            out = ((R & 0x00FF00FF) << 7) \
                | ((sel & 0x00010001) << 6) \
                | ((sel & 0x00080008) << 12)
        else:
            sel = (G >> 8) & 0x00090009
            out = (((R >> 8) & 0x00FF00FF) << 7) \
                | ((sel & 0x00010001) << 6) \
                | ((sel & 0x00080008) << 12)
        outs.append(out)
    return outs


VARIANTS = dict(v2=v2, v2b=v2b, v2c=v2c)


def check(name, fn):
    ev, od = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")

    @jax.jit
    def diff():
        bad = jnp.int32(0)
        for p in range(4):
            w = ((ev.astype(np.int64) << (4 * p))
                 | (od.astype(np.int64) << (16 + 4 * p)))
            wj = jnp.asarray(w.astype(np.uint32).astype(np.int32))
            bad += jnp.sum(fp4_pair_patterns(wj, 4 * p) != fn(wj)[p])
        return bad

    ok = int(diff()) == 0
    print(f"{name}: exact={ok}", flush=True)
    return ok


def make_fn(mode):
    def kern(wp_ref, xp_ref, s_ref, tbl_ref, o_ref, *, kc4):
        wp = wp_ref[:]
        s = s_ref[:]
        tm2 = wp.shape[0]
        tm = 2 * tm2
        k_id = pl.program_id(2)
        sf = s.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 12.0)
        sp = pltpu.bitcast(sf, jnp.int32)
        srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // NB, axis=1),
                             jnp.bfloat16)
        if mode == "mixg":
            tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
            Ds = [fp4_pair_patterns(wp, 4 * p) for p in range(3)]
            lo = (wp >> 12) & 15
            hi = (wp >> 28) & 15
            Ds.append(_take16_chunked(tbl128, lo)
                      | (_take16_chunked(tbl128, hi) << 16))
        else:
            Ds = VARIANTS[mode](wp)
        tt = xp_ref.shape[0]
        part = jnp.zeros((tt, tm), jnp.float32)
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
        tm, kc4 = _pick_tiles_pair(M, K4, None)
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
                pl.BlockSpec((1, 256), lambda t, i, kq: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tm), lambda t, i, kq: (t, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3),
        )(wp2, xp, scales, TBLJ)

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
    for mode in (sys.argv[1:] or ["v2", "v2b", "v2c", "mixg"]):
        f = make_fn(mode)
        out = np.asarray(f(x, wp2, scales))
        if ref is None:
            ref = out
        rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        dt = time_scan_chain(lambda xx, w, s: f(xx, w, s), x,
                             iters=300, trials=2, consts=(wp2, scales))
        print(f"{mode:6s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s "
              f"(rel {rel:.1e})", flush=True)


if __name__ == "__main__":
    for nm, fn in VARIANTS.items():
        if not check(nm, fn):
            raise SystemExit(f"{nm} NOT exact")
    main()
