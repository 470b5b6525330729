"""NF4 decode mechanism race (round 2) — target: beat the planar
gather+tree mix4 (measured 247us / 30.2 tok/s e2e b1) by enough for
NF4 b1 >= 45 tok/s, which needs the [14336,4096] T=1 kernel at
~170us or less.

Variants (all EXACT to the bf16 NF4 pattern table):

  planar_mix4 : production baseline (matmul_4bit_pallas quant_type=nf4)
  pair_tree2  : pair layout, per-shift radix-2 xor-select tree (the
                known-losing 24.9 tok/s path, timed for reference)
  pair_byte4  : NEW - byte-SWAR dual-plane decode: the pattern's hi and
                lo BYTES are each resolved by a radix-4 xor-mux tree
                over byte fields (4 codes per op, masks shared between
                planes), then assembled like fp4_pair_patterns_all
  pair_gather : dual per-half int32-pattern gather (known 263us)
  pair_mix_gt : NEW - shifts 0,1 via the dual gather (gather unit) and
                shifts 2,3 via the radix-2 tree (VPU) - probing whether
                Mosaic overlaps the two issue resources
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
    _pick_tiles_pair, planar_to_pair, pair_permute_activation,
    matmul_4bit_pallas)
from quantizations_tpu.ops.gemv import pack_i32_rows, _take16_chunked
from quantizations_tpu.ops.lut import pair_patterns_tree
from quantizations_tpu.quant.codebooks import NF4_CODE
from quantizations_tpu.utils.timing import time_scan_chain

M, K = 14336, 4096
K4 = K // 4
NB = K // 64

PAT = np.asarray(np.asarray(NF4_CODE, np.float32).astype(
    ml_dtypes.bfloat16)).view(np.uint16).astype(np.int64)
HI = [int(p) >> 8 for p in PAT]          # 16 hi-byte constants
LO = [int(p) & 0xFF for p in PAT]        # 16 lo-byte constants


def _c32(v):
    return jnp.int32(np.uint32(v & 0xFFFFFFFF).astype(np.int32))


def _b4(v):  # per-byte constant replicated into all 4 byte fields
    return _c32(v | (v << 8) | (v << 16) | (v << 24))


def byte_tree4(N, consts, masks, m01, m23):
    """Radix-4 xor-mux over byte fields: N holds one code per byte
    (low nibble), consts = 16 byte values."""
    lvl = []
    for g in range(4):
        A, B, C, D = consts[4 * g:4 * g + 4]
        v = (_b4(A)
             ^ (_b4(A ^ B) & masks[0])
             ^ (_b4(A ^ C) & masks[1])
             ^ (_b4(A ^ B ^ C ^ D) & m01))
        lvl.append(v)
    L0, L1, L2, L3 = lvl
    return (L0 ^ ((L0 ^ L1) & masks[2]) ^ ((L0 ^ L2) & masks[3])
            ^ ((L0 ^ L1 ^ L2 ^ L3) & m23))


def pair_byte4(words):
    """All 8 codes decoded via hi/lo byte-plane radix-4 trees."""
    N0 = words & 0x0F0F0F0F
    N1 = (words >> 4) & 0x0F0F0F0F
    planes = []
    for N in (N0, N1):
        masks = []
        for b in range(4):
            mb = (N >> b) & 0x01010101
            masks.append((mb << 8) - mb)     # 0xFF per byte iff bit set
        m01 = masks[0] & masks[1]
        m23 = masks[2] & masks[3]
        hi = byte_tree4(N, HI, masks, m01, m23)
        lo = byte_tree4(N, LO, masks, m01, m23)
        planes.append((hi, lo))
    outs = []
    for p in range(4):
        hi, lo = planes[p & 1]
        if p < 2:   # bytes 0 (even row) and 2 (odd row)
            out = ((hi & 0x00FF00FF) << 8) | (lo & 0x00FF00FF)
        else:       # bytes 1 and 3
            out = ((hi & _c32(0xFF00FF00)) << 0) \
                | ((lo >> 8) & 0x00FF00FF)
        outs.append(out)
    return outs


def pair_tree2(words):
    return [pair_patterns_tree(words, 4 * p, NF4_CODE) for p in range(4)]


# ---------------------------------------------------------- CPU exactness
def check(name, fn):
    ev, od = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")

    @jax.jit
    def diff():
        bad = jnp.int32(0)
        for p in range(4):
            w = ((ev.astype(np.int64) << (4 * p))
                 | (od.astype(np.int64) << (16 + 4 * p)))
            wj = jnp.asarray(w.astype(np.uint32).astype(np.int32))
            bad += jnp.sum(pair_patterns_tree(wj, 4 * p, NF4_CODE)
                           != fn(wj)[p])
        return bad

    ok = int(diff()) == 0
    print(f"{name}: exact={ok}", flush=True)
    return ok


# ------------------------------------------------------------- kernels
TBL = np.zeros((1, 256), np.int32)
TBL[0, :16] = PAT.astype(np.int32)
TBLJ = jnp.asarray(TBL)


def make_pair_fn(mode):
    def kern(wp_ref, xp_ref, s_ref, tbl_ref, o_ref, *, kc4):
        wp = wp_ref[:]
        s = s_ref[:]
        tm2 = wp.shape[0]
        tm = 2 * tm2
        k_id = pl.program_id(2)
        sf = s.astype(jnp.bfloat16)
        sp = pltpu.bitcast(sf, jnp.int32)
        srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // NB, axis=1),
                             jnp.bfloat16)
        if mode == "byte4":
            Ds = pair_byte4(wp)
        elif mode == "tree2":
            Ds = pair_tree2(wp)
        elif mode == "gather":
            tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
            Ds = []
            for p in range(4):
                lo = (wp >> (4 * p)) & 15
                hi = (wp >> (16 + 4 * p)) & 15
                glo = _take16_chunked(tbl128, lo)
                ghi = _take16_chunked(tbl128, hi)
                Ds.append(glo | (ghi << 16))
        elif mode.startswith("mix_gt"):
            ng = {"mix_gt": 2, "mix_gt1": 1, "mix_gt3": 3}[mode]
            tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
            Ds = []
            for p in range(ng):
                lo = (wp >> (4 * p)) & 15
                hi = (wp >> (16 + 4 * p)) & 15
                Ds.append(_take16_chunked(tbl128, lo)
                          | (_take16_chunked(tbl128, hi) << 16))
            Ds += [pair_patterns_tree(wp, 4 * p, NF4_CODE)
                   for p in range(ng, 4)]
        elif mode == "mix_g02bt":
            # production candidate: gather planes 0,2 + ONE odd-nibble
            # byte-pair tree for planes 1,3 (the plane split respects
            # the byte pairing, unlike mix_gb which pays both Ns' trees)
            from quantizations_tpu.ops.qmatmul import pair_patterns_mix_bt
            tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
            Ds = pair_patterns_mix_bt(wp, tbl128, NF4_CODE)
        elif mode == "mix_gb":
            # gather for planes 0,1; byte4 (shared-mask SWAR) for 2,3
            tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
            Ds = []
            for p in range(2):
                lo = (wp >> (4 * p)) & 15
                hi = (wp >> (16 + 4 * p)) & 15
                Ds.append(_take16_chunked(tbl128, lo)
                          | (_take16_chunked(tbl128, hi) << 16))
            Ds += pair_byte4(words=wp)[2:]
        elif mode in ("mix_gtc", "gather_c"):
            # CHUNK-DOT gather: skip _take16_chunked's lane concat by
            # dotting each gathered 128-lane piece straight into the
            # accumulator (MXU dots are ~free at T=1 — 4 full dots cost
            # 1.4us of the 199us kernel, manual_split decomposition).
            # Tree planes (mix_gtc: 2,3) stay full-width.
            tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
            gplanes = (0, 1) if mode == "mix_gtc" else (0, 1, 2, 3)
            tt = xp_ref.shape[0]
            part = jnp.zeros((tt, tm), jnp.float32)
            for q in range(kc4 // 128):
                sl = slice(q * 128, (q + 1) * 128)
                wq = wp[:, sl]
                sq = srep[:, sl]
                for p in gplanes:
                    lo = (wq >> (4 * p)) & 15
                    hi = (wq >> (16 + 4 * p)) & 15
                    Dq = (jnp.take_along_axis(tbl128, lo, axis=1)
                          | (jnp.take_along_axis(tbl128, hi, axis=1)
                             << 16))
                    Wq = pltpu.bitcast(Dq, jnp.bfloat16) * sq
                    xq = xp_ref[:, p, sl].astype(jnp.bfloat16)
                    part = part + jax.lax.dot_general(
                        xq, Wq, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            for p in range(4):
                if p in gplanes:
                    continue
                D = pair_patterns_tree(wp, 4 * p, NF4_CODE)
                Wj = pltpu.bitcast(D, jnp.bfloat16) * srep
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

            return
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

    ref = np.asarray(matmul_4bit_pallas(wpp, scales, x, quant_type="nf4"))
    dt = time_scan_chain(
        lambda xx, w, s: matmul_4bit_pallas(w, s, xx, quant_type="nf4"),
        x, iters=300, trials=2, consts=(wpp, scales))
    print(f"{'planar_mix4':14s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s",
          flush=True)

    for mode in (sys.argv[1:] or ["byte4", "tree2", "gather", "mix_gt",
                                  "mix_g02bt", "mix_gb"]):
        f = make_pair_fn(mode)
        out = np.asarray(f(x, wp2, scales))
        rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        dt = time_scan_chain(lambda xx, w, s: f(xx, w, s), x,
                             iters=300, trials=2, consts=(wp2, scales))
        print(f"pair_{mode:9s} {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s "
              f"(rel {rel:.1e})", flush=True)


if __name__ == "__main__":
    if not check("pair_byte4", pair_byte4):
        raise SystemExit("pair_byte4 NOT exact")
    main()
