"""Checkpoint tests (SURVEY.md §5 checkpoint/resume): a synthesized tiny
HF safetensors checkpoint loads + quantizes to the same params as direct
quantization, and pre-quantized save/load round-trips exactly."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import QuantConfig
from quantizations_tpu.models.hf_loader import (
    config_from_hf,
    load_hf_llama,
    load_quantized,
    save_quantized,
)
from quantizations_tpu.models.llama import KVCache, prefill

H, INTER, LAYERS, HEADS, KV, HD, VOCAB = 128, 256, 2, 2, 2, 64, 256


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Write a tiny HF-Llama-format checkpoint to disk."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("hf_tiny")
    cfgj = {
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": VOCAB, "hidden_size": H,
        "intermediate_size": INTER, "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS, "num_key_value_heads": KV,
        "head_dim": HD, "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
        "rope_scaling": {
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
    }
    (d / "config.json").write_text(json.dumps(cfgj))

    rng = np.random.default_rng(0)

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    tensors = {
        "model.embed_tokens.weight": w(VOCAB, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(VOCAB, H),
    }
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        tensors[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            H, np.float32)
        tensors[p + "self_attn.q_proj.weight"] = w(HEADS * HD, H)
        tensors[p + "self_attn.k_proj.weight"] = w(KV * HD, H)
        tensors[p + "self_attn.v_proj.weight"] = w(KV * HD, H)
        tensors[p + "self_attn.o_proj.weight"] = w(H, HEADS * HD)
        tensors[p + "mlp.gate_proj.weight"] = w(INTER, H)
        tensors[p + "mlp.up_proj.weight"] = w(INTER, H)
        tensors[p + "mlp.down_proj.weight"] = w(H, INTER)
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


def test_config_from_hf(hf_dir):
    cfg = config_from_hf(hf_dir)
    assert cfg.hidden_size == H
    assert cfg.num_key_value_heads == KV
    assert cfg.rope_scaling == (8.0, 1.0, 4.0, 64)


def test_load_and_forward(hf_dir):
    cfg, params = load_hf_llama(hf_dir, quant=QuantConfig(quant_type="nf4"))
    # nf4 -> pair runtime layout (same default as fp4 since the
    # gather+tree mix decode)
    assert params.layers.q.wp.shape == (LAYERS, HEADS * HD // 2, H // 4)
    assert params.layers.q.out_features == HEADS * HD
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    import functools

    logits, _ = jax.jit(functools.partial(prefill, cfg=cfg))(
        params, ids, KVCache.create(cfg, 1, 16))
    assert logits.shape == (1, 3, VOCAB)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_quantized_roundtrip(hf_dir, tmp_path):
    cfg, params = load_hf_llama(hf_dir)
    path = str(tmp_path / "quantized.safetensors")
    save_quantized(params, path)
    loaded = load_quantized(path, cfg)
    np.testing.assert_array_equal(
        np.asarray(loaded.layers.q.wp), np.asarray(params.layers.q.wp))
    np.testing.assert_array_equal(
        np.asarray(loaded.layers.down.scales),
        np.asarray(params.layers.down.scales))
    np.testing.assert_array_equal(
        np.asarray(loaded.lm_head.wp), np.asarray(params.lm_head.wp))
    # embed round-trips through fp32 -> bf16 (it was bf16 already)
    np.testing.assert_array_equal(
        np.asarray(loaded.embed, dtype=np.float32),
        np.asarray(params.embed, dtype=np.float32))


def test_quantized_roundtrip_family_leaves(tmp_path):
    """Gemma-2 sandwich norms / Qwen3 qk norms / Qwen2 biases survive
    save_quantized -> load_quantized (previously _iter_qlinears listed
    only the base leaves, silently dropping them — the reloaded model
    skipped the norms entirely)."""
    import dataclasses
    import functools

    from quantizations_tpu.models.llama import (TINY_LLAMA,
                                                init_llama_params)

    cfg = dataclasses.replace(TINY_LLAMA, post_norms=True,
                              qk_norm=True, attention_bias=True)
    params = init_llama_params(cfg, seed=0)
    path = str(tmp_path / "q.safetensors")
    save_quantized(params, path)
    loaded = load_quantized(path, cfg)
    for attr in ("post_attn_norm", "post_mlp_norm", "q_norm", "k_norm",
                 "q_bias", "k_bias", "v_bias"):
        got = getattr(loaded.layers, attr)
        assert got is not None, attr
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32),
            np.asarray(getattr(params.layers, attr), dtype=np.float32))
    pf = jax.jit(functools.partial(prefill, cfg=cfg))
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    lo, _ = pf(loaded, ids, KVCache.create(cfg, 1, 16))
    po, _ = pf(params, ids, KVCache.create(cfg, 1, 16))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(po))


def test_load_onto_mesh(hf_dir):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from quantizations_tpu.parallel import make_mesh

    mesh = make_mesh((2,), ("tp",))
    cfg, params = load_hf_llama(hf_dir, mesh=mesh)
    # column-parallel q: sharded over rows (pair layout halves wp rows)
    per_shard_rows = HEADS * HD // 2
    if params.layers.q.layout == "pair":
        per_shard_rows //= 2
    shard_shapes = [s.data.shape
                    for s in params.layers.q.wp.addressable_shards]
    assert all(ss[1] == per_shard_rows for ss in shard_shapes)
    # row-parallel down stays planar (pair layout is shard-local on K)
    assert params.layers.down.layout == "planar"


def test_qwen2_style_attention_bias(tmp_path):
    """A Qwen2-architecture checkpoint (qkv bias) loads, biases flow
    through the forward, and the pre-quantized save/load round-trips
    them."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(1)
    d = tmp_path / "qwen_tiny"
    d.mkdir()
    cfgj = {
        "architectures": ["Qwen2ForCausalLM"],
        "vocab_size": VOCAB, "hidden_size": H,
        "intermediate_size": INTER, "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS, "num_key_value_heads": KV,
        "head_dim": HD, "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 64, "tie_word_embeddings": False,
    }
    (d / "config.json").write_text(json.dumps(cfgj))

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    tensors = {
        "model.embed_tokens.weight": w(VOCAB, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(VOCAB, H),
    }
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        tensors[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            H, np.float32)
        tensors[p + "self_attn.q_proj.weight"] = w(HEADS * HD, H)
        tensors[p + "self_attn.k_proj.weight"] = w(KV * HD, H)
        tensors[p + "self_attn.v_proj.weight"] = w(KV * HD, H)
        tensors[p + "self_attn.q_proj.bias"] = w(HEADS * HD)
        tensors[p + "self_attn.k_proj.bias"] = w(KV * HD)
        tensors[p + "self_attn.v_proj.bias"] = w(KV * HD)
        tensors[p + "self_attn.o_proj.weight"] = w(H, HEADS * HD)
        tensors[p + "mlp.gate_proj.weight"] = w(INTER, H)
        tensors[p + "mlp.up_proj.weight"] = w(INTER, H)
        tensors[p + "mlp.down_proj.weight"] = w(H, INTER)
    save_file(tensors, str(d / "model.safetensors"))

    cfg, params = load_hf_llama(str(d))
    assert cfg.attention_bias
    assert params.layers.q_bias is not None
    assert params.layers.q_bias.shape == (LAYERS, HEADS * HD)

    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    import functools

    pf = jax.jit(functools.partial(prefill, cfg=cfg))
    logits, _ = pf(params, ids, KVCache.create(cfg, 1, 16))
    assert bool(jnp.all(jnp.isfinite(logits)))

    # zeroing the biases changes the logits (they are live in the path)
    import dataclasses as _dc

    params0 = params.replace(layers=params.layers.replace(
        q_bias=jnp.zeros_like(params.layers.q_bias),
        k_bias=jnp.zeros_like(params.layers.k_bias),
        v_bias=jnp.zeros_like(params.layers.v_bias)))
    logits0, _ = pf(params0, ids, KVCache.create(cfg, 1, 16))
    assert not np.allclose(np.asarray(logits), np.asarray(logits0))

    # pre-quantized round-trip preserves biases
    path = str(tmp_path / "q.safetensors")
    save_quantized(params, path)
    loaded = load_quantized(path, cfg)
    np.testing.assert_array_equal(
        np.asarray(loaded.layers.q_bias, dtype=np.float32),
        np.asarray(params.layers.q_bias, dtype=np.float32))


def test_mistral_style_sliding_window_config(tmp_path):
    """Mistral-format config: sliding_window honored; Qwen2 gates it
    behind use_sliding_window (off by default)."""
    d = tmp_path / "m"
    d.mkdir()
    base = {
        "vocab_size": 64, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 1, "num_attention_heads": 1,
        "num_key_value_heads": 1, "head_dim": 64,
    }
    (d / "config.json").write_text(json.dumps({
        **base, "architectures": ["MistralForCausalLM"],
        "sliding_window": 4096}))
    from quantizations_tpu.models.hf_loader import config_from_hf

    cfg = config_from_hf(str(d))
    assert cfg.sliding_window == 4096 and not cfg.attention_bias

    (d / "config.json").write_text(json.dumps({
        **base, "architectures": ["Qwen2ForCausalLM"],
        "sliding_window": 32768}))
    cfg = config_from_hf(str(d))
    assert cfg.sliding_window is None and cfg.attention_bias

    (d / "config.json").write_text(json.dumps({
        **base, "architectures": ["Qwen2ForCausalLM"],
        "sliding_window": 32768, "use_sliding_window": True}))
    cfg = config_from_hf(str(d))
    assert cfg.sliding_window == 32768


def test_quantization_config_adoption_rules(tmp_path):
    """config_from_hf adopts bnb_4bit_quant_type only from a GENUINE
    bnb 4-bit stanza (quant_method + load_in_4bit): HF serializes
    bnb_4bit_quant_type even for 8-bit configs, and stale stanzas on
    dense/merged checkpoints must not override an explicit request."""
    from quantizations_tpu.config import QuantConfig
    from quantizations_tpu.models.hf_loader import config_from_hf

    base = {
        "architectures": ["LlamaForCausalLM"], "vocab_size": 64,
        "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 2, "head_dim": 16,
    }

    def mk(name, qc):
        d = tmp_path / name
        d.mkdir()
        cfg = dict(base)
        if qc is not None:
            cfg["quantization_config"] = qc
        (d / "config.json").write_text(json.dumps(cfg))
        return str(d)

    genuine = mk("genuine", {"quant_method": "bitsandbytes",
                             "load_in_4bit": True,
                             "bnb_4bit_quant_type": "nf4"})
    assert config_from_hf(genuine).quant.quant_type == "nf4"
    assert config_from_hf(
        genuine, QuantConfig(quant_type="fp4")).quant.quant_type == "nf4"

    eightbit = mk("eightbit", {"quant_method": "bitsandbytes",
                               "load_in_8bit": True,
                               "bnb_4bit_quant_type": "fp4"})
    assert config_from_hf(
        eightbit, QuantConfig(quant_type="nf4")).quant.quant_type == "nf4"

    stale = mk("stale", {"bnb_4bit_quant_type": "fp4"})
    assert config_from_hf(
        stale, QuantConfig(quant_type="nf4")).quant.quant_type == "nf4"
