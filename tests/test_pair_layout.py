"""SWAR row-pair layout: packing round-trips, XLA-path equivalence with
the planar layout, and the layout-aware model plumbing (CPU; the Pallas
pair kernel itself is validated on hardware via bench/benchmarks)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantizations_tpu.ops.gemv import pack_i32_rows
from quantizations_tpu.ops.qmatmul import (
    pair_permute_activation,
    pair_to_planar,
    planar_to_pair,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_planar_pair_roundtrip(rng):
    for (M, K) in [(16, 64), (128, 512), (30, 256)]:
        if M % 2:
            continue
        by = jnp.asarray(
            rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
        wp = pack_i32_rows(by, M, K)
        wp2 = planar_to_pair(wp)
        assert wp2.shape == (M // 2, K // 4)
        assert bool(jnp.all(pair_to_planar(wp2) == wp))


def test_pair_layout_stacked_roundtrip(rng):
    by = jnp.asarray(
        rng.integers(0, 256, (3, 8, 32), dtype=np.int64).astype(np.int32))
    wp = pack_i32_rows(by.reshape(-1, 32), 24, 64).reshape(3, 8, 8)
    wp2 = planar_to_pair(wp)
    assert wp2.shape == (3, 4, 16)
    assert bool(jnp.all(pair_to_planar(wp2) == wp))


def test_pair_column_map(rng):
    """wp2 word w plane p exposes exactly the columns the layout doc
    promises, matched by pair_permute_activation."""
    M, K = 4, 64
    codes = rng.integers(0, 16, (M, K)).astype(np.int64)
    by = np.zeros((M, K // 2), np.int64)
    # bnb byte = even<<4 | odd
    by = (codes[:, 0::2] << 4) | codes[:, 1::2]
    wp = pack_i32_rows(jnp.asarray(by.astype(np.int32)), M, K)
    wp2 = np.asarray(planar_to_pair(wp))
    K8 = K // 8
    NB = K // 64

    def col(w, p):
        # block-major word order: w = r*NB + b (second half = odd planes)
        half, wl = (1, w - 8 * NB) if w >= 8 * NB else (0, w)
        r, b = wl // NB, wl % NB
        return 64 * b + 8 * r + 4 * half + p

    for i in range(M // 2):
        for w in range(K // 4):
            for p in range(4):
                c = col(w, p)
                lo = (wp2[i, w] >> (4 * p)) & 15
                hi = (wp2[i, w] >> (16 + 4 * p)) & 15
                assert lo == codes[2 * i, c], (i, w, p)
                assert hi == codes[2 * i + 1, c], (i, w, p)
    # activation permute aligns x with the same map
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    xp = np.asarray(pair_permute_activation(x))
    for w in range(K // 4):
        for p in range(4):
            np.testing.assert_array_equal(
                xp[:, p, w], np.asarray(x)[:, col(w, p)])


def test_model_pair_vs_planar_equivalence(rng):
    """Tiny model end-to-end: pair runtime layout produces the same
    tokens as the planar layout on the XLA path."""
    import dataclasses

    from quantizations_tpu.config import QuantConfig, ServeConfig
    from quantizations_tpu.models.llama import (
        TINY_LLAMA, init_llama_params, quantize_linear)
    from quantizations_tpu.serve.generate import make_generate_fn

    cfg = dataclasses.replace(TINY_LLAMA, quant=QuantConfig(quant_type="fp4"))
    serve = ServeConfig(max_seq_len=32, max_new_tokens=8, temperature=0.0)
    params = init_llama_params(cfg, seed=0)
    assert params.layers.q.layout == "pair"

    # planar twin: convert every pair leaf back
    from quantizations_tpu.models.llama import QLinear

    def to_planar(leaf):
        if isinstance(leaf, QLinear) and leaf.layout == "pair":
            from quantizations_tpu.ops.qmatmul import unpack_scale_pairs

            # packed bf16x2 scales are a pair-layout-only storage form;
            # the planar twin needs the widened per-row float scales
            scales = (unpack_scale_pairs(leaf.scales)
                      if leaf.scales_packed else leaf.scales)
            return QLinear(wp=pair_to_planar(leaf.wp), scales=scales)
        return leaf

    params_planar = jax.tree.map(
        to_planar, params,
        is_leaf=lambda x: isinstance(x, QLinear))

    from quantizations_tpu.models.llama import KVCache

    gen = make_generate_fn(cfg, serve)
    prompt = jnp.asarray([[3, 5, 7, 11]], jnp.int32)
    key = jax.random.PRNGKey(0)
    cache = KVCache.create(cfg, 1, serve.max_seq_len)
    toks_pair = np.asarray(gen(params, prompt, cache, key)[0])
    cache = KVCache.create(cfg, 1, serve.max_seq_len)
    toks_planar = np.asarray(gen(params_planar, prompt, cache, key)[0])
    np.testing.assert_array_equal(toks_pair, toks_planar)


def test_quantize_linear_layouts(rng):
    from quantizations_tpu.models.llama import quantize_linear

    W = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    pair = quantize_linear(W)
    assert pair.layout == "pair" and pair.wp.shape == (16, 32)
    assert pair.out_features == 32 and pair.in_features == 128
    planar = quantize_linear(W, layout="planar")
    assert planar.layout == "planar" and planar.wp.shape == (32, 16)
    # nf4 now ALSO defaults to pair (the gather+tree dual-issue mix
    # beats the planar gather mix — nf4_mechanism_probe.py); explicit
    # planar still works (required for row-parallel shards)
    nf4 = quantize_linear(W, quant_type="nf4")
    assert nf4.layout == "pair"
    nf4p = quantize_linear(W, quant_type="nf4", layout="planar")
    assert nf4p.layout == "planar"
    assert bool(jnp.all(pair_to_planar(pair.wp) == planar.wp))


def test_embed_lookup_pair_matches_planar(rng):
    from quantizations_tpu.models.llama import (
        QLinear, embed_lookup, quantize_linear)

    W = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    pair = quantize_linear(W)
    planar = QLinear(wp=pair_to_planar(pair.wp), scales=pair.scales)
    ids = jnp.asarray(rng.integers(0, 64, (2, 5)))
    np.testing.assert_array_equal(
        np.asarray(embed_lookup(pair, ids)),
        np.asarray(embed_lookup(planar, ids)))


def test_linear4bit_pair_layout(rng):
    """Module layer with pair layout: same outputs as planar, and
    packed_u8 round-trips to the bnb byte order."""
    from quantizations_tpu.nn.linear import Linear4bit

    W = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    lin_planar = Linear4bit.create(W)
    lin_pair = Linear4bit.create(W, layout="pair")
    assert lin_pair.weight.layout == "pair"
    np.testing.assert_array_equal(
        np.asarray(lin_pair(x)), np.asarray(lin_planar(x)))
    np.testing.assert_array_equal(
        np.asarray(lin_pair.weight.packed_u8()),
        np.asarray(lin_planar.weight.packed_u8()))


def test_fp4_pair_patterns_all_bit_exact(rng):
    """The byte-SWAR all-shifts decode is bit-identical to the
    per-shift SWAR over all 256 (even,odd) code pairs at every shift
    and over random full words."""
    from quantizations_tpu.ops.lut import (
        fp4_pair_patterns, fp4_pair_patterns_all)

    ev, od = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    for p in range(4):
        w = ((ev.astype(np.int64) << (4 * p))
             | (od.astype(np.int64) << (16 + 4 * p)))
        wj = jnp.asarray(w.astype(np.uint32).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(fp4_pair_patterns_all(wj)[p]),
            np.asarray(fp4_pair_patterns(wj, 4 * p)), err_msg=f"p={p}")
    wr = jnp.asarray(rng.integers(-2**31, 2**31, (64, 128),
                                  dtype=np.int64).astype(np.int32))
    outs = fp4_pair_patterns_all(wr)
    for p in range(4):
        np.testing.assert_array_equal(
            np.asarray(outs[p]), np.asarray(fp4_pair_patterns(wr, 4 * p)))


def test_pair_kernel_interpret(rng):
    """Pair Pallas kernel in interpret mode (CPU CI), incl. odd token
    counts (tile_t collapses to 1). Tolerance is loose: interpret-mode
    emulation of bf16 ops differs from hardware in rounding points."""
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_pallas, matmul_4bit_pallas)

    M, K = 256, 512
    by = jnp.asarray(
        rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
    wp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wp)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    for T in (1, 3, 8):
        x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
        a = np.asarray(matmul_4bit_pair_pallas(
            wp2, scales, x, interpret=True))
        b = np.asarray(matmul_4bit_pallas(
            wp, scales, x, quant_type="fp4", interpret=True))
        denom = np.max(np.abs(b)) + 1e-9
        assert np.max(np.abs(a - b)) / denom < 5e-3, T


def test_pair_kernel_nf4_mix_interpret(rng):
    """NF4 pair kernel (gather+tree mix decode) against the planar
    kernel in interpret mode. Numerics class: bf16 pattern table x bf16
    scales (same as the FP4 pair path), vs the planar kernel's fp32
    values — loose bf16-rounding tolerance."""
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_pallas, matmul_4bit_pallas)

    M, K = 256, 512
    by = jnp.asarray(
        rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
    wp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wp)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    for T in (1, 4):
        x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
        a = np.asarray(matmul_4bit_pair_pallas(
            wp2, scales, x, quant_type="nf4", interpret=True))
        b = np.asarray(matmul_4bit_pallas(
            wp, scales, x, quant_type="nf4", interpret=True))
        denom = np.max(np.abs(b)) + 1e-9
        assert np.max(np.abs(a - b)) / denom < 1e-2, T


def test_pair_stacked_nf4_mix_interpret(rng):
    """Stacked (layer-indexed) NF4 pair kernel with the table operand
    behind scalar prefetch."""
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_pallas, matmul_4bit_pair_pallas_stacked)

    M, K, L = 128, 256, 3
    by = jnp.asarray(
        rng.integers(0, 256, (L, M, K // 2),
                     dtype=np.int64).astype(np.int32))
    wps = jnp.stack([planar_to_pair(pack_i32_rows(by[l], M, K))
                     for l in range(L)])
    scales = jnp.asarray(rng.random((L, M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    for l in (0, 2):
        a = np.asarray(matmul_4bit_pair_pallas_stacked(
            wps, scales, x, jnp.int32(l), quant_type="nf4",
            interpret=True))
        b = np.asarray(matmul_4bit_pair_pallas(
            wps[l], scales[l], x, quant_type="nf4", interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_dense_matmul_pair_matches_planar(rng):
    """The pair-native dense matmul (prefill path) matches the planar
    dequant+dot within fp32 accumulation-order noise."""
    from quantizations_tpu.nn.linear import (
        dense_matmul_pair, dequantize_permuted, permute_cols)

    M, K = 128, 512
    by = jnp.asarray(
        rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
    wp = pack_i32_rows(by, M, K)
    wp2 = planar_to_pair(wp)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((9, K)).astype(np.float32))
    for qt in ("fp4", "nf4"):
        a = np.asarray(dense_matmul_pair(x, wp2, scales, qt))
        W = dequantize_permuted(wp, scales, qt, dtype=jnp.bfloat16)
        b = np.asarray(jnp.dot(permute_cols(x.astype(jnp.bfloat16)), W.T,
                               preferred_element_type=jnp.float32))
        denom = np.max(np.abs(b)) + 1e-9
        assert np.max(np.abs(a - b)) / denom < 2e-2, qt


def test_pair_pack_matches_cpp_golden(rng):
    """planar_to_pair agrees with the scalar C++ golden pair pack."""
    from quantizations_tpu.utils import golden

    for (M, K) in [(8, 128), (32, 256)]:
        by = rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(
            np.uint8)
        want = golden.pack_pair(by, M, K)
        wp = pack_i32_rows(jnp.asarray(by.astype(np.int32)), M, K)
        got = np.asarray(planar_to_pair(wp))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_manual_pipeline_matches_grid_kernel(rng, quant_type):
    """The manual double-buffered DMA pipeline kernel is bit-identical
    to the grid-pipelined pair kernel (same decode, scales, and
    accumulation order)."""
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_manual, matmul_4bit_pair_pallas)

    M, K = 256, 512
    by = jnp.asarray(
        rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
    wp2 = planar_to_pair(pack_i32_rows(by, M, K))
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    for T in (1, 4):
        x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
        a = np.asarray(matmul_4bit_pair_manual(
            wp2, scales, x, quant_type=quant_type, interpret=True))
        b = np.asarray(matmul_4bit_pair_pallas(
            wp2, scales, x, quant_type=quant_type, interpret=True))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("decode", ["arith_sr", "mixg0", "mixg02"])
def test_fp4_mix_decode_bit_exact(rng, decode):
    """QuantConfig.fp4_decode strategies are bit-identical to the
    byte-SWAR arithmetic decode through both pair kernels: the gather
    mixes read RAW bf16 patterns (codebook x 12, all exactly
    representable — the srep fold is unchanged) and "arith_sr" only
    strength-reduces the blend's constant multiplies (exact by the
    byte-local algebra in ops/lut.fp4_pair_patterns_all_sr)."""
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_manual, matmul_4bit_pair_pallas)

    M, K = 256, 512
    by = jnp.asarray(
        rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
    wp2 = planar_to_pair(pack_i32_rows(by, M, K))
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    want = np.asarray(matmul_4bit_pair_pallas(
        wp2, scales, x, quant_type="fp4", interpret=True))
    got = np.asarray(matmul_4bit_pair_pallas(
        wp2, scales, x, quant_type="fp4", decode=decode, interpret=True))
    np.testing.assert_array_equal(got, want)
    got_man = np.asarray(matmul_4bit_pair_manual(
        wp2, scales, x, quant_type="fp4", decode=decode, interpret=True))
    np.testing.assert_array_equal(got_man, want)


@pytest.mark.parametrize("decode", ["mix_bt", "mix_g3"])
def test_nf4_alt_decode_bit_exact(rng, decode):
    """QuantConfig.nf4_decode alternatives ("mix_bt": gather planes 0,2
    + odd-nibble radix-4 byte tree; "mix_g3": 3 gather planes + 1 tree
    plane) are bit-identical to the default gather+radix-2-tree mix
    through both pair kernels."""
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_manual, matmul_4bit_pair_pallas)

    M, K = 256, 512
    by = jnp.asarray(
        rng.integers(0, 256, (M, K // 2), dtype=np.int64).astype(np.int32))
    wp2 = planar_to_pair(pack_i32_rows(by, M, K))
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    want = np.asarray(matmul_4bit_pair_pallas(
        wp2, scales, x, quant_type="nf4", interpret=True))
    got = np.asarray(matmul_4bit_pair_pallas(
        wp2, scales, x, quant_type="nf4", decode=decode, interpret=True))
    np.testing.assert_array_equal(got, want)
    got_man = np.asarray(matmul_4bit_pair_manual(
        wp2, scales, x, quant_type="nf4", decode=decode, interpret=True))
    np.testing.assert_array_equal(got_man, want)


def test_manual_vmem_gate():
    """The manual pipeline holds scales / activation / output as whole
    un-tiled VMEM operands, so huge-M projections must be rejected (the
    128256-row lm_head overflowed the 16 MB scoped-vmem limit at compile
    time on v5e — round 3). Standard 8B projection shapes stay eligible,
    with the weight-slot budget shrinking the tile for wide-K."""
    from quantizations_tpu.ops.qmatmul import (
        _pick_tile_manual, manual_vmem_ok)

    # all seven 8B projections (incl. fused qkv) fit
    for m, k in ((4096, 4096), (1024, 4096), (6144, 4096),
                 (14336, 4096), (4096, 14336)):
        assert manual_vmem_ok(m, k, 1), (m, k)
    # the lm_head and the fused gate_up don't (scales lane-pad to 128)
    assert not manual_vmem_ok(128256, 4096, 1)
    assert not manual_vmem_ok(28672, 4096, 1)
    # wide-K shrinks the weight slots to <= ~4 MB instead of rejecting
    assert _pick_tile_manual(4096, 14336 // 4) == 128
    assert _pick_tile_manual(4096, 4096 // 4) == 512


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_manual_pipeline_stacked(rng, quant_type):
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_manual_stacked, matmul_4bit_pair_pallas)

    M, K, L = 128, 256, 3
    bys = jnp.asarray(rng.integers(
        0, 256, (L, M, K // 2), dtype=np.int64).astype(np.int32))
    wps = jnp.stack([planar_to_pair(pack_i32_rows(bys[l], M, K))
                     for l in range(L)])
    scales = jnp.asarray(rng.random((L, M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    for l in (0, 2):
        a = np.asarray(matmul_4bit_pair_manual_stacked(
            wps, scales, x, jnp.int32(l), quant_type=quant_type,
            interpret=True))
        b = np.asarray(matmul_4bit_pair_pallas(
            wps[l], scales[l], x, quant_type=quant_type, interpret=True))
        np.testing.assert_array_equal(a, b)


def test_pair_patterns_mix_bt_bit_exact(rng):
    """The gather+byte-tree mix (planes 0,2 gathered; planes 1,3 via
    one odd-nibble byte-pair radix-4 tree) is bit-identical to the
    radix-2 half-word tree on every plane, over all 256 (even,odd)
    code pairs per plane and random full words."""
    from quantizations_tpu.ops.lut import (pair_patterns_byte_pair,
                                           pair_patterns_tree)
    from quantizations_tpu.ops.qmatmul import (_pattern_table,
                                               pair_patterns_mix_bt)
    from quantizations_tpu.quant.codebooks import NF4_CODE

    ev, od = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    words = []
    for p in range(4):
        w = ((ev.astype(np.int64) << (4 * p))
             | (od.astype(np.int64) << (16 + 4 * p)))
        words.append(w.astype(np.uint32).astype(np.int32))
    words.append(np.asarray(rng.integers(-2**31, 2**31, (16, 16),
                                         dtype=np.int64), np.int32))
    tblrow = _pattern_table(NF4_CODE)    # [1, 128]
    for w in words:
        wj = jnp.asarray(w)
        ref = [np.asarray(pair_patterns_tree(wj, 4 * p, NF4_CODE))
               for p in range(4)]
        bp = pair_patterns_byte_pair(wj, NF4_CODE, odd=True)
        np.testing.assert_array_equal(np.asarray(bp[0]), ref[1])
        np.testing.assert_array_equal(np.asarray(bp[1]), ref[3])
        bp0 = pair_patterns_byte_pair(wj, NF4_CODE, odd=False)
        np.testing.assert_array_equal(np.asarray(bp0[0]), ref[0])
        np.testing.assert_array_equal(np.asarray(bp0[1]), ref[2])
        tbl128 = jnp.broadcast_to(tblrow[:, :128], (wj.shape[0], 128))
        mix = pair_patterns_mix_bt(wj, tbl128, NF4_CODE)
        for p in range(4):
            np.testing.assert_array_equal(np.asarray(mix[p]), ref[p],
                                          err_msg=f"p={p}")
