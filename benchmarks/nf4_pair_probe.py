import functools, jax, jax.numpy as jnp, numpy as np, ml_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import sys; sys.path.insert(0, "/root/repo")
from quantizations_tpu.ops.qmatmul import (_pick_tiles_pair, planar_to_pair,
    pair_permute_activation, matmul_4bit_pallas)
from quantizations_tpu.ops.gemv import pack_i32_rows, _take16_chunked
from quantizations_tpu.quant.codebooks import NF4_CODE
from quantizations_tpu.utils.timing import time_scan_chain

M, K = 14336, 4096
K4 = K // 4
NB = K // 64
rng = np.random.default_rng(0)
by = jnp.asarray(rng.integers(0, 256, (M, K//2), dtype=np.int64).astype(np.int32))
wpp = pack_i32_rows(by, M, K)
wp2 = planar_to_pair(wpp)
scales = jnp.asarray(rng.random((M, K//64), np.float32))
x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
nbytes = wp2.nbytes + scales.nbytes

pat = np.asarray(np.asarray(NF4_CODE, np.float32).astype(ml_dtypes.bfloat16)).view(np.uint16).astype(np.int64)
TBL = np.zeros((1, 256), np.int32)
TBL[0, :16] = pat.astype(np.int32)
TBLj = jnp.asarray(TBL)

def kern(wp_ref, xp_ref, s_ref, tbl_ref, o_ref):
    wp = wp_ref[:]
    s = s_ref[:]
    tm2, kc4 = wp.shape
    tm = 2 * tm2
    k_id = pl.program_id(2)
    sf = s.astype(jnp.bfloat16)
    sp = pltpu.bitcast(sf, jnp.int32)
    srep = pltpu.bitcast(pltpu.repeat(sp, kc4 // NB, axis=1), jnp.bfloat16)
    tbl128 = jnp.broadcast_to(tbl_ref[0:1, :128], (tm2, 128))
    tt = xp_ref.shape[0]
    part = jnp.zeros((tt, tm), jnp.float32)
    for p in range(4):
        lo = (wp >> (4 * p)) & 15
        hi = (wp >> (16 + 4 * p)) & 15
        glo = _take16_chunked(tbl128, lo)
        ghi = _take16_chunked(tbl128, hi)
        D = glo | (ghi << 16)
        Wp = pltpu.bitcast(D, jnp.bfloat16)
        Wj = Wp * srep
        xj = xp_ref[:, p, :].astype(jnp.bfloat16)
        part = part + jax.lax.dot_general(xj, Wj, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
    @pl.when(k_id == 0)
    def _(): o_ref[:] = part
    @pl.when(k_id != 0)
    def _(): o_ref[:] = o_ref[:] + part

@jax.jit
def f(x, wp2, scales):
    T = x.shape[0]
    tile_m, kc4 = _pick_tiles_pair(M, K4, None)
    xp = pair_permute_activation(x)
    return pl.pallas_call(kern,
        grid=(T, M//tile_m, K4//kc4),
        in_specs=[pl.BlockSpec((tile_m//2, kc4), lambda t,i,kq: (i,kq), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, kc4), lambda t,i,kq: (t,0,kq), memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_m, NB), lambda t,i,kq: (i,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 256), lambda t,i,kq: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_m), lambda t,i,kq: (t,i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)*3),
    )(wp2, xp, scales, TBLj)

a = np.asarray(matmul_4bit_pallas(wpp, scales, x, quant_type="nf4"))
b = np.asarray(f(x, wp2, scales))
rel = np.max(np.abs(a-b)) / (np.max(np.abs(a)) + 1e-9)
print(f"nf4 pair-gather vs planar rel: {rel:.2e}", flush=True)
dt = time_scan_chain(lambda xx, w, s: f(xx, w, s), x, iters=300, trials=2, consts=(wp2, scales))
print(f"nf4 pair-gather: {dt*1e6:8.1f}us {nbytes/dt/1e9:6.1f} GB/s", flush=True)
dt2 = time_scan_chain(lambda xx, w, s: matmul_4bit_pallas(w, s, xx, quant_type="nf4"), x,
                      iters=300, trials=2, consts=(wpp, scales))
print(f"nf4 planar mix4 : {dt2*1e6:8.1f}us {nbytes/dt2/1e9:6.1f} GB/s", flush=True)
