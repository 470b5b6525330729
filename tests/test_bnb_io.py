"""File-level bitsandbytes checkpoint interop (HF flat-key format).

The reference's drop-in claim rests on HF's bnb serialization schema
(reference core.py:29-42 ``valid_qs_keys``). These tests synthesize a
genuine bnb-format safetensors payload (flat ``<prefix>.weight.*`` keys
+ the uint8 JSON ``quant_state.bitsandbytes__fp4`` tensor), round-trip
it through disk, and check bit-exactness against both the functional
quantizer and the C++ golden oracle.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantizations_tpu.quant.bnb_io import (
    bnb_flat_tensors,
    is_bnb_quantized,
    load_bnb_linear4bit,
    parse_bnb_flat,
    qlinear_arrays_from_bnb,
)
from quantizations_tpu.quant.functional import (
    dequantize_4bit,
    quantize_4bit,
)


def _roundtrip_disk(tensors, tmp_path):
    from safetensors.numpy import load_file, save_file

    p = os.path.join(tmp_path, "bnb.safetensors")
    save_file(tensors, p)
    return load_file(p)


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
@pytest.mark.parametrize("nested", [True, False])
def test_flat_roundtrip_bit_exact(tmp_path, quant_type, nested):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    packed, state = quantize_4bit(W, quant_type=quant_type,
                                  compress_statistics=nested)
    flat = bnb_flat_tensors("model.layers.0.self_attn.q_proj",
                            np.asarray(packed), state)
    t = _roundtrip_disk(flat, tmp_path)

    # the JSON metadata tensor is genuine HF-bnb format
    key = f"model.layers.0.self_attn.q_proj.weight.quant_state.bitsandbytes__{quant_type}"
    meta = json.loads(bytes(t[key]).decode("utf-8"))
    assert meta["quant_type"] == quant_type
    assert meta["blocksize"] == 64
    assert tuple(meta["shape"]) == (64, 256)
    assert ("nested_offset" in meta) == nested

    assert is_bnb_quantized(t, "model.layers.0.self_attn.q_proj")
    packed2, state2 = parse_bnb_flat(
        t.__getitem__, t, "model.layers.0.self_attn.q_proj")
    np.testing.assert_array_equal(packed2.reshape(-1),
                                  np.asarray(packed).reshape(-1))
    np.testing.assert_array_equal(np.asarray(state2.absmax),
                                  np.asarray(state.absmax))
    assert state2.blocksize == state.blocksize
    assert state2.quant_type == quant_type
    assert state2.shape == (64, 256)
    assert state2.nested == nested
    if nested:
        np.testing.assert_array_equal(np.asarray(state2.state2.absmax),
                                      np.asarray(state.state2.absmax))
        np.testing.assert_allclose(float(state2.offset), float(state.offset),
                                   rtol=0, atol=0)
    # dequantization of the parsed payload is bit-identical
    a = np.asarray(dequantize_4bit(packed, state, dtype=jnp.float32))
    b = np.asarray(dequantize_4bit(jnp.asarray(packed2), state2,
                                   dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_qlinear_arrays_match_quantize_path():
    """Loading a bnb payload must produce the exact runtime arrays the
    in-repo quantize path produces for the same weight."""
    from quantizations_tpu.nn.linear import Params4bit

    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.standard_normal((32, 512)).astype(np.float32))
    packed, state = quantize_4bit(W, quant_type="fp4")
    wp, scales = qlinear_arrays_from_bnb(np.asarray(packed), state)
    ref = Params4bit.quantize(W, quant_type="fp4")
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(ref.wp))
    np.testing.assert_array_equal(np.asarray(scales),
                                  np.asarray(ref.scales))
    # pair layout variant round-trips through the same converter
    wp_pair, _ = qlinear_arrays_from_bnb(np.asarray(packed), state,
                                         layout="pair")
    from quantizations_tpu.ops.qmatmul import pair_to_planar

    np.testing.assert_array_equal(np.asarray(pair_to_planar(wp_pair)),
                                  np.asarray(ref.wp))


def test_golden_oracle_through_bnb_file(tmp_path):
    """C++ golden scalar quantizer -> bnb flat file -> parse -> the
    runtime packed words must equal the oracle's repack output."""
    golden = pytest.importorskip("quantizations_tpu.utils.golden")

    rng = np.random.default_rng(2)
    W = rng.standard_normal((16, 128)).astype(np.float32)
    g_packed, g_absmax = golden.quantize_4bit(W.reshape(-1), 64, "fp4")

    # build the bnb payload from the ORACLE's outputs (not our quantizer)
    packed, state = quantize_4bit(jnp.asarray(W), quant_type="fp4",
                                  compress_statistics=False)
    np.testing.assert_array_equal(np.asarray(packed).reshape(-1),
                                  g_packed.reshape(-1))
    flat = bnb_flat_tensors("lin", g_packed.reshape(-1, 1), state)
    t = _roundtrip_disk(flat, tmp_path)
    p2, s2 = parse_bnb_flat(t.__getitem__, t, "lin")
    wp, scales = qlinear_arrays_from_bnb(p2, s2)
    np.testing.assert_array_equal(
        np.asarray(wp).reshape(-1),
        golden.repack_bytes_to_i32(g_packed.reshape(-1)))
    np.testing.assert_allclose(np.asarray(scales).reshape(-1), g_absmax,
                               rtol=0, atol=0)


def test_load_bnb_linear4bit_forward(tmp_path):
    """A Linear4bit loaded from a bnb file computes the same outputs as
    one created by quantizing the weight directly."""
    from quantizations_tpu.nn.linear import Linear4bit

    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((64,)).astype(np.float32))
    packed, state = quantize_4bit(W, quant_type="nf4")
    flat = bnb_flat_tensors("m.fc", np.asarray(packed), state)
    flat["m.fc.bias"] = np.asarray(bias)
    t = _roundtrip_disk(flat, tmp_path)

    lin = load_bnb_linear4bit(t.__getitem__, t, "m.fc")
    ref = Linear4bit.create(W, bias=bias, quant_type="nf4")
    x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(lin(x)), np.asarray(ref(x)))


def test_load_hf_llama_from_bnb_checkpoint(tmp_path):
    """Full-model drop-in: a synthesized bnb-serialized HF checkpoint
    directory loads through load_hf_llama and produces logits identical
    to quantize-on-load of the dense weights (the codes/statistics are
    shared, so the parameters must be numerically identical)."""
    from safetensors.numpy import save_file

    from quantizations_tpu.models.hf_loader import load_hf_llama
    from quantizations_tpu.models.llama import KVCache, prefill

    H, I, V, L, NH, NKV, D = 64, 128, 96, 2, 4, 2, 16
    hf_cfg = dict(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=NH,
        num_key_value_heads=NKV, head_dim=D, rope_theta=10000.0,
        rms_norm_eps=1e-5, max_position_embeddings=256,
        tie_word_embeddings=False, architectures=["LlamaForCausalLM"],
    )
    rng = np.random.default_rng(4)

    def dense(shape):
        return (0.05 * rng.standard_normal(shape)).astype(np.float32)

    dense_tensors = {}
    bnb_tensors = {}
    lin_shapes = {
        "self_attn.q_proj": (NH * D, H), "self_attn.k_proj": (NKV * D, H),
        "self_attn.v_proj": (NKV * D, H), "self_attn.o_proj": (H, NH * D),
        "mlp.gate_proj": (I, H), "mlp.up_proj": (I, H),
        "mlp.down_proj": (H, I),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        for nm, shp in lin_shapes.items():
            W = dense(shp)
            dense_tensors[p + nm + ".weight"] = W
            packed, state = quantize_4bit(jnp.asarray(W), quant_type="fp4")
            bnb_tensors.update(
                bnb_flat_tensors(p + nm, np.asarray(packed), state))
        for nm in ("input_layernorm", "post_attention_layernorm"):
            g = np.ones((H,), np.float32)
            dense_tensors[p + nm + ".weight"] = g
            bnb_tensors[p + nm + ".weight"] = g
    for nm, shp in (("model.embed_tokens.weight", (V, H)),
                    ("model.norm.weight", (H,)),
                    ("lm_head.weight", (V, H))):
        t = dense(shp) if len(shp) == 2 else np.ones(shp, np.float32)
        dense_tensors[nm] = t
        bnb_tensors[nm] = t

    def write_ckpt(name, tensors):
        d = os.path.join(tmp_path, name)
        os.makedirs(d)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(hf_cfg, f)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        return d

    from quantizations_tpu.config import QuantConfig

    q = QuantConfig(quant_type="fp4", quantize_embedding=False,
                    quantize_lm_head=False)
    cfg_d, params_d = load_hf_llama(write_ckpt("dense", dense_tensors),
                                    quant=q)
    cfg_b, params_b = load_hf_llama(write_ckpt("bnb", bnb_tensors),
                                    quant=q)

    ids = jnp.asarray(rng.integers(0, V, (1, 8)), jnp.int32)
    ld, _ = jax.jit(lambda p, t: prefill(p, t, KVCache.create(cfg_d, 1, 16),
                                         cfg_d))(params_d, ids)
    lb, _ = jax.jit(lambda p, t: prefill(p, t, KVCache.create(cfg_b, 1, 16),
                                         cfg_b))(params_b, ids)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(lb))


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_save_bnb_checkpoint_roundtrip(tmp_path, quant_type):
    """Model-level bnb EXPORT -> load_hf_llama round trip: packed words
    bit-identical, scales exact without double quantization (and prefill
    logits identical), within the nested-codebook step with it."""
    import dataclasses
    import functools

    from quantizations_tpu.config import QuantConfig
    from quantizations_tpu.models.hf_loader import (
        load_hf_llama, save_bnb_checkpoint)
    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params, prefill)

    cfg = dataclasses.replace(
        TINY_LLAMA, tie_word_embeddings=False,
        quant=QuantConfig(quant_type=quant_type,
                          quantize_embedding=False,
                          quantize_lm_head=False))
    params = init_llama_params(cfg, seed=0)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    def logits(c, p):
        lo, _ = jax.jit(functools.partial(prefill, cfg=c))(
            p, ids, KVCache.create(c, 1, 16))
        return np.asarray(lo)

    d = str(tmp_path / "exact")
    save_bnb_checkpoint(params, cfg, d, compress_statistics=False)
    cfg2, loaded = load_hf_llama(d, quant=cfg.quant)
    np.testing.assert_array_equal(np.asarray(loaded.layers.q.wp),
                                  np.asarray(params.layers.q.wp))
    np.testing.assert_array_equal(
        np.asarray(loaded.layers.down.scales, dtype=np.float32),
        np.asarray(params.layers.down.scales, dtype=np.float32))
    np.testing.assert_array_equal(logits(cfg2, loaded),
                                  logits(cfg, params))

    d2 = str(tmp_path / "nested")
    save_bnb_checkpoint(params, cfg, d2, compress_statistics=True)
    cfg3, loaded3 = load_hf_llama(d2, quant=cfg.quant)
    np.testing.assert_array_equal(np.asarray(loaded3.layers.q.wp),
                                  np.asarray(params.layers.q.wp))
    s0 = np.asarray(params.layers.q.scales, dtype=np.float32)
    s3 = np.asarray(loaded3.layers.q.scales, dtype=np.float32)
    # double quantization is lossy on the statistics: bounded by the
    # dynamic 8-bit codebook step over the absmax range
    assert np.max(np.abs(s3 - s0)) <= 0.05 * np.max(np.abs(s0)) + 1e-6


def test_config_to_hf_roundtrip(tmp_path):
    """config_to_hf emits a config.json that config_from_hf maps back
    to the same family knobs (all five model families)."""
    import dataclasses

    from quantizations_tpu.models.hf_loader import (
        config_from_hf, config_to_hf)
    from quantizations_tpu.models.llama import TINY_LLAMA

    families = {
        "llama": dict(),
        "qwen2": dict(attention_bias=True),
        "mistral": dict(sliding_window=8),
        "gemma2": dict(post_norms=True, norm_plus_one=True,
                       embed_normalizer=True,
                       hidden_activation="gelu_tanh",
                       attn_logit_softcap=50.0,
                       final_logit_softcap=30.0, query_scale=16,
                       sliding_window=8, sliding_layers="even"),
        "qwen3": dict(qk_norm=True),
    }
    for name, kw in families.items():
        cfg = dataclasses.replace(TINY_LLAMA, **kw)
        d = os.path.join(tmp_path, name)
        os.makedirs(d)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config_to_hf(cfg), f)
        cfg2 = config_from_hf(d, quant=cfg.quant)
        for fld in ("vocab_size", "hidden_size", "num_key_value_heads",
                    "head_dim", "attention_bias", "sliding_window",
                    "sliding_layers", "post_norms", "norm_plus_one",
                    "embed_normalizer", "hidden_activation", "qk_norm",
                    "attn_logit_softcap", "final_logit_softcap",
                    "query_scale", "tie_word_embeddings",
                    "rope_scaling"):
            assert getattr(cfg2, fld) == getattr(cfg, fld), (name, fld)


def test_load_bnb_adopts_stored_quant_type(tmp_path):
    """A pre-quantized bnb checkpoint dictates its own quant type: a
    default (fp4-configured) load of an NF4 export adopts nf4 instead
    of silently decoding NF4 codes with the FP4 codebook (both via the
    config.json quantization_config stanza and the flat tensor keys)."""
    import dataclasses
    import functools

    from quantizations_tpu.config import QuantConfig
    from quantizations_tpu.models.hf_loader import (
        load_hf_llama, save_bnb_checkpoint)
    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params, prefill)

    cfg = dataclasses.replace(
        TINY_LLAMA, tie_word_embeddings=False,
        quant=QuantConfig(quant_type="nf4", quantize_embedding=False,
                          quantize_lm_head=False))
    params = init_llama_params(cfg, seed=0)
    d = str(tmp_path / "nf4")
    save_bnb_checkpoint(params, cfg, d, compress_statistics=False)

    # a default load adopts the stored type (head/embed knobs default)
    cfg_def, _ = load_hf_llama(d, quant=None)
    assert cfg_def.quant.quant_type == "nf4"

    # an explicit fp4 request is overridden too; with matching
    # head/embed knobs the logits are bit-identical to the source
    cfg2, loaded = load_hf_llama(d, quant=QuantConfig(
        quant_type="fp4", quantize_embedding=False,
        quantize_lm_head=False))
    assert cfg2.quant.quant_type == "nf4"
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    lo, _ = jax.jit(functools.partial(prefill, cfg=cfg2))(
        loaded, ids, KVCache.create(cfg2, 1, 16))
    lo0, _ = jax.jit(functools.partial(prefill, cfg=cfg))(
        params, ids, KVCache.create(cfg, 1, 16))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo0))
