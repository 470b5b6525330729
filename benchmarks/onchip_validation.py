"""On-chip (Mosaic, not interpret) numerics validation of every Pallas
kernel against the functional bnb-semantics path and the C++ golden
oracle. Run on the real chip:

    python benchmarks/onchip_validation.py

Expected: quantize/dequantize bit-exact, stacked==flat bitwise, GEMV
within fp32 reduction-order noise (<1e-4 rel).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import quantizations_tpu.quant as q
from quantizations_tpu.ops import (gemv_4bit_pallas, gemv_4bit_pallas_stacked,
                                   pack_i32_rows, quantize_4bit_pallas,
                                   dequantize_4bit_pallas)
from quantizations_tpu.utils import golden

rng = np.random.default_rng(0)
ok = True

for qt in ("fp4", "nf4"):
    M, K = 512, 1024
    W = (rng.standard_normal((M, K)) * 0.2).astype(np.float32)
    wp, absmax = quantize_4bit_pallas(jnp.asarray(W), quant_type=qt)
    packed_ref, state = q.quantize_4bit(jnp.asarray(W), quant_type=qt,
                                        compress_statistics=False)
    wp_ref = pack_i32_rows(packed_ref, M, K)
    eq_wp = bool(jnp.all(wp == wp_ref))
    eq_s = bool(jnp.all(absmax.reshape(-1) == state.absmax))
    print(f"quantize {qt}: wp bit-exact={eq_wp} absmax exact={eq_s}")
    ok &= eq_wp and eq_s

M, K = 1024, 4096
W = (rng.standard_normal((M, K)) * 0.1).astype(np.float32)
packed, state = q.quantize_4bit(jnp.asarray(W), quant_type="fp4",
                                compress_statistics=False)
wp = pack_i32_rows(packed, M, K)
scales = state.absmax.reshape(M, K // 64)
x = rng.standard_normal((1, K)).astype(np.float32)
out = np.asarray(gemv_4bit_pallas(wp, scales, jnp.asarray(x)))
ref = golden.gemv_4bit(np.asarray(packed), np.asarray(state.absmax), x,
                       M, K, 64, "fp4")
err = np.max(np.abs(out.reshape(-1) - ref) / (np.abs(ref) + 1e-3))
print(f"gemv on-chip vs golden: max rel err = {err:.2e}")
ok &= err < 1e-4

wp3 = jnp.stack([wp, wp, wp])
sc3 = jnp.stack([scales, scales, scales])
out_st = np.asarray(gemv_4bit_pallas_stacked(wp3, sc3, jnp.asarray(x),
                                             jnp.int32(1)))
d = np.max(np.abs(out_st - out))
print(f"stacked vs flat on-chip: max abs delta = {d:.2e}")
ok &= d == 0.0

dq = np.asarray(dequantize_4bit_pallas(wp, scales, quant_type="fp4",
                                       dtype=jnp.float32))
ref_dq = np.asarray(q.dequantize_4bit(packed, state, dtype=jnp.float32))
d2 = np.max(np.abs(dq - ref_dq))
print(f"dequantize on-chip vs functional: max abs = {d2:.2e}")
ok &= d2 == 0.0
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
