"""On-chip (Mosaic, not interpret) numerics validation of every Pallas
kernel against the functional bnb-semantics path, the C++ golden oracle
and host-side reference attention. Run on the real chip:

    python benchmarks/onchip_validation.py [base] [pair] [attn]

(default: all three sections). This is the STANDING first step of every
measurement chain (VERDICT r3 #10): interpret-mode CI provably misses
Mosaic constraints — round 3's int8 scale-plane block-rule bug only
surfaced on hardware — so every kernel variant x dtype x KVH cell runs
here before any headline number is taken.

Expected: quantize/dequantize bit-exact, stacked==flat bitwise, GEMV
within fp32 reduction-order noise (<1e-4 rel), every pair-decode
strategy bit-identical to its default, attention within online-softmax
noise of the host reference.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import quantizations_tpu.quant as q
from quantizations_tpu.ops import (gemv_4bit_pallas, gemv_4bit_pallas_stacked,
                                   pack_i32_rows, quantize_4bit_pallas,
                                   dequantize_4bit_pallas)
from quantizations_tpu.utils import golden

rng = np.random.default_rng(0)
ok = True


def run_base():
    global ok
    for qt in ("fp4", "nf4"):
        M, K = 512, 1024
        W = (rng.standard_normal((M, K)) * 0.2).astype(np.float32)
        wp, absmax = quantize_4bit_pallas(jnp.asarray(W), quant_type=qt)
        packed_ref, state = q.quantize_4bit(jnp.asarray(W), quant_type=qt,
                                            compress_statistics=False)
        wp_ref = pack_i32_rows(packed_ref, M, K)
        eq_wp = bool(jnp.all(wp == wp_ref))
        eq_s = bool(jnp.all(absmax.reshape(-1) == state.absmax))
        print(f"quantize {qt}: wp bit-exact={eq_wp} absmax exact={eq_s}",
              flush=True)
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
    print(f"gemv on-chip vs golden: max rel err = {err:.2e}", flush=True)
    ok &= err < 1e-4

    wp3 = jnp.stack([wp, wp, wp])
    sc3 = jnp.stack([scales, scales, scales])
    out_st = np.asarray(gemv_4bit_pallas_stacked(wp3, sc3, jnp.asarray(x),
                                                 jnp.int32(1)))
    d = np.max(np.abs(out_st - out))
    print(f"stacked vs flat on-chip: max abs delta = {d:.2e}", flush=True)
    ok &= d == 0.0

    dq = np.asarray(dequantize_4bit_pallas(wp, scales, quant_type="fp4",
                                           dtype=jnp.float32))
    ref_dq = np.asarray(q.dequantize_4bit(packed, state, dtype=jnp.float32))
    d2 = np.max(np.abs(dq - ref_dq))
    print(f"dequantize on-chip vs functional: max abs = {d2:.2e}",
          flush=True)
    ok &= d2 == 0.0


# ------------------------------------------------- pair-kernel variants

PAIR_STRATEGIES = {
    # decode=None selects the configured default per quant type
    "fp4": [None, "arith_sr", "mixg0", "mixg02"],
    "nf4": [None, "mix_bt", "mix_g3"],
}


def run_pair_variants():
    """Every pair-decode strategy x {grid, manual, stacked} must be
    bit-identical to the grid default on chip."""
    global ok
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_manual,
        matmul_4bit_pair_pallas,
        matmul_4bit_pair_pallas_stacked,
        pack_pair_rows,
    )

    M, K, T = 512, 1024, 1
    by = jnp.asarray(rng.integers(0, 256, (M, K // 2),
                                  dtype=np.int64).astype(np.int32))
    wp2 = pack_pair_rows(by.reshape(-1), M, K)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32) + 0.1)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    wp2_st = jnp.stack([wp2, wp2 + 0, wp2])
    sc_st = jnp.stack([scales, scales, scales])
    # bf16x2 packed-scale cells must ALSO be bit-identical: the host
    # pack (lax.bitcast_convert_type, even row in the low 16 bits) has
    # to match the in-kernel pltpu.bitcast sublane-merge convention —
    # a mismatch swaps even/odd row scales ON HARDWARE ONLY (interpret
    # mode is self-consistent), exactly the class this file exists for
    from quantizations_tpu.ops.qmatmul import pack_scale_pairs

    sc_packed = pack_scale_pairs(scales)
    sc_packed_st = pack_scale_pairs(sc_st)

    for qt, strategies in PAIR_STRATEGIES.items():
        ref = None
        for dec in strategies:
            name = dec or "default"
            try:
                out = np.asarray(matmul_4bit_pair_pallas(
                    wp2, scales, x, quant_type=qt, decode=dec))
            except Exception as e:
                print(f"pair {qt}/{name}/grid: FAILED {str(e)[:160]}",
                      flush=True)
                ok = False
                continue
            if ref is None:
                ref = out
                print(f"pair {qt}/{name}/grid: reference", flush=True)
            else:
                same = bool((out == ref).all())
                print(f"pair {qt}/{name}/grid: bit-identical={same}",
                      flush=True)
                ok &= same
            for variant, fn in (
                ("manual", lambda: matmul_4bit_pair_manual(
                    wp2, scales, x, quant_type=qt, decode=dec)),
                ("stacked", lambda: matmul_4bit_pair_pallas_stacked(
                    wp2_st, sc_st, x, jnp.int32(1), quant_type=qt,
                    decode=dec)),
            ):
                try:
                    o2 = np.asarray(fn())
                    same = bool((o2 == ref).all())
                    print(f"pair {qt}/{name}/{variant}: "
                          f"bit-identical={same}", flush=True)
                    ok &= same
                except Exception as e:
                    print(f"pair {qt}/{name}/{variant}: FAILED "
                          f"{str(e)[:160]}", flush=True)
                    ok = False
        # packed bf16x2 scales, default decode, all three pipelines
        for variant, fn in (
            ("grid", lambda: matmul_4bit_pair_pallas(
                wp2, sc_packed, x, quant_type=qt)),
            ("manual", lambda: matmul_4bit_pair_manual(
                wp2, sc_packed, x, quant_type=qt)),
            ("stacked", lambda: matmul_4bit_pair_pallas_stacked(
                wp2_st, sc_packed_st, x, jnp.int32(1), quant_type=qt)),
        ):
            try:
                o2 = np.asarray(fn())
                same = bool((o2 == ref).all())
                print(f"pair {qt}/bf16x2/{variant}: bit-identical={same}",
                      flush=True)
                ok &= same
            except Exception as e:
                print(f"pair {qt}/bf16x2/{variant}: FAILED "
                      f"{str(e)[:160]}", flush=True)
                ok = False


# ----------------------------------------------------- attention grid

def _ref_attention(q_, k, v, lengths, scale=None, softcap=None,
                   window=None, q_span=1):
    """Host reference: online-softmax-free attention, q [B,KVH,q_span*G,D]
    row t*G+g is query position lengths[b]-1+t (the verify-window
    convention pinned by tests/test_paged.py: attend span <= len-1+t
    AND span > len-1+t-win)."""
    B, KVH, QG, D = q_.shape
    G = QG // q_span
    qf = q_.astype(np.float32) * (scale if scale is not None
                                  else D ** -0.5)
    out = np.zeros((B, KVH, QG, D), np.float32)
    for b in range(B):
        for h in range(KVH):
            s = qf[b, h] @ k[b, h].T.astype(np.float32)   # [QG, S]
            if softcap is not None:
                s = softcap * np.tanh(s / softcap)
            for t in range(q_span):
                qpos = lengths[b] - 1 + t
                rows = slice(t * G, (t + 1) * G)
                s[rows, qpos + 1:] = -np.inf
                if window is not None:
                    s[rows, :max(qpos + 1 - window, 0)] = -np.inf
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ v[b, h].astype(np.float32)
    return out


def _check(name, out, ref, tol=1e-2):
    # On chip the q@k / p@v dots run bf16 MXU passes (~2-4e-3 rel vs
    # the fp32 host reference — measured chain_r4b); 1e-2 separates
    # that rounding class from real indexing/masking bugs (which show
    # up as O(1) errors).
    global ok
    err = np.max(np.abs(out - ref)) / (np.abs(ref).max() + 1e-6)
    good = err < tol
    print(f"attn {name}: max rel err = {err:.2e} ok={good}", flush=True)
    ok &= good


def run_attention_grid():
    """flash/paged x {bf16, int8} x KVH {1, 2} x knob cells vs the host
    reference — the exact grid class where round 3's on-chip-only bug
    lived (int8 scale planes at KVH>1)."""
    from quantizations_tpu.ops.attention import (
        flash_decode_attention_stacked,
        flash_decode_attention_stacked_i8,
    )
    from quantizations_tpu.ops.paged_attention import (
        paged_flash_decode_attention,
        paged_flash_decode_attention_i8,
    )

    L, B, S, D, G = 2, 2, 512, 128, 4
    lens = np.asarray([512, 130], np.int32)

    for KVH in (1, 2):
        qh = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
        k = (rng.standard_normal((L, B, KVH, S, D)) * 0.3).astype(
            np.float32)
        v = (rng.standard_normal((L, B, KVH, S, D)) * 0.3).astype(
            np.float32)
        for window in (None, 96):
            wargs = (None if window is None
                     else jnp.int32(window))
            out = np.asarray(flash_decode_attention_stacked(
                jnp.asarray(qh), jnp.asarray(k, jnp.float32),
                jnp.asarray(v, jnp.float32), jnp.int32(1),
                jnp.asarray(lens), softcap=30.0, window=wargs))
            ref = _ref_attention(qh, k[1], v[1], lens, softcap=30.0,
                                 window=window)
            _check(f"flash/bf16/KVH{KVH}/win{window}", out, ref)

        # int8 cells: synthetic codes + per-position scales (decoupled
        # from the cache writer; the dequant contract is code * scale)
        codes_k = rng.integers(-127, 128, (L, B, KVH, S, D),
                               dtype=np.int64).astype(np.int8)
        codes_v = rng.integers(-127, 128, (L, B, KVH, S, D),
                               dtype=np.int64).astype(np.int8)
        sk = (rng.random((L, B, KVH, S)) * 0.01 + 0.001).astype(np.float32)
        sv = (rng.random((L, B, KVH, S)) * 0.01 + 0.001).astype(np.float32)
        skb = jnp.asarray(sk, jnp.bfloat16)
        svb = jnp.asarray(sv, jnp.bfloat16)
        out = np.asarray(flash_decode_attention_stacked_i8(
            jnp.asarray(qh), jnp.asarray(codes_k), jnp.asarray(codes_v),
            skb, svb, jnp.int32(1), jnp.asarray(lens)))
        kd = codes_k.astype(np.float32) * np.asarray(
            skb, np.float32)[..., None]
        vd = codes_v.astype(np.float32) * np.asarray(
            svb, np.float32)[..., None]
        ref = _ref_attention(qh, kd[1], vd[1], lens)
        _check(f"flash/int8/KVH{KVH}", out, ref)

    # paged cells
    page, P = 128, 12
    max_pages = S // page
    KVH = 2
    table = rng.permutation(np.arange(1, 1 + B * max_pages)).reshape(
        B, max_pages).astype(np.int32)
    pk = (rng.standard_normal((L, P, KVH, page, D)) * 0.3).astype(
        np.float32)
    pv = (rng.standard_normal((L, P, KVH, page, D)) * 0.3).astype(
        np.float32)

    kg = np.stack([np.concatenate([pk[1, table[b, j]]
                                   for j in range(max_pages)], axis=1)
                   for b in range(B)])        # [B, KVH, S, D]
    vg = np.stack([np.concatenate([pv[1, table[b, j]]
                                   for j in range(max_pages)], axis=1)
                   for b in range(B)])

    for q_span in (1, 3):
        # q rows sit at positions len-1+t: leave q_span-1 slack
        lens_q = np.minimum(lens, S - (q_span - 1)).astype(np.int32)
        for pps in (1, 2):
            qh = rng.standard_normal((B, KVH, q_span * G, D)).astype(
                np.float32)
            out = np.asarray(paged_flash_decode_attention(
                jnp.asarray(qh), jnp.asarray(pk, jnp.float32),
                jnp.asarray(pv, jnp.float32), jnp.asarray(table),
                jnp.int32(1), jnp.asarray(lens_q), q_span=q_span,
                pages_per_step=pps, window=jnp.int32(10**6)))
            ref = _ref_attention(qh, kg, vg, lens_q, q_span=q_span,
                                 window=10**6)
            _check(f"paged/bf16/qspan{q_span}/pps{pps}", out, ref)

    pk8 = rng.integers(-127, 128, (L, P, KVH, page, D),
                       dtype=np.int64).astype(np.int8)
    pv8 = rng.integers(-127, 128, (L, P, KVH, page, D),
                       dtype=np.int64).astype(np.int8)
    psk = jnp.asarray((rng.random((L, P, KVH, page)) * 0.01 + 1e-3),
                      jnp.bfloat16)
    psv = jnp.asarray((rng.random((L, P, KVH, page)) * 0.01 + 1e-3),
                      jnp.bfloat16)
    kd = pk8.astype(np.float32) * np.asarray(psk, np.float32)[..., None]
    vd = pv8.astype(np.float32) * np.asarray(psv, np.float32)[..., None]
    kg8 = np.stack([np.concatenate([kd[1, table[b, j]]
                                    for j in range(max_pages)], axis=1)
                    for b in range(B)])
    vg8 = np.stack([np.concatenate([vd[1, table[b, j]]
                                    for j in range(max_pages)], axis=1)
                    for b in range(B)])
    for q_span in (1, 3):
        lens_q = np.minimum(lens, S - (q_span - 1)).astype(np.int32)
        for pps in (1, 2):
            qh = rng.standard_normal((B, KVH, q_span * G, D)).astype(
                np.float32)
            out = np.asarray(paged_flash_decode_attention_i8(
                jnp.asarray(qh), jnp.asarray(pk8), jnp.asarray(pv8),
                psk, psv, jnp.asarray(table), jnp.int32(1),
                jnp.asarray(lens_q), q_span=q_span, pages_per_step=pps))
            ref = _ref_attention(qh, kg8, vg8, lens_q, q_span=q_span)
            _check(f"paged/int8/qspan{q_span}/pps{pps}", out, ref,
                   tol=1e-2)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["base", "pair", "attn"]
    if "base" in modes:
        run_base()
    if "pair" in modes:
        run_pair_variants()
    if "attn" in modes:
        run_attention_grid()
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
