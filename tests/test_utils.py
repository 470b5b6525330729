"""Small-surface tests: metrics, mesh helpers, config validation,
tied-embedding checkpoint loading."""

import json

import jax
import numpy as np
import pytest

from quantizations_tpu.config import QuantConfig, ServeConfig
from quantizations_tpu.parallel.multihost import (
    host_local_batch,
    make_dp_tp_mesh,
)
from quantizations_tpu.utils.profiling import StepMetrics, model_weight_bytes


def test_step_metrics_json():
    m = StepMetrics(tokens=60, step_s=2.0, weight_bytes=5 * 10**9)
    d = json.loads(m.to_json())
    assert d["tokens_per_s"] == 30.0
    assert d["achieved_hbm_gbps"] == 2.5


def test_quant_config_validation():
    with pytest.raises(ValueError):
        QuantConfig(quant_type="int8")
    with pytest.raises(ValueError):
        QuantConfig(blocksize=96)
    assert QuantConfig(quant_type="nf4").blocksize == 64


def test_serve_config_tp():
    s = ServeConfig(mesh_shape=(2, 4), mesh_axes=("dp", "tp"))
    assert s.tp == 4
    assert ServeConfig().tp == 1


def test_dp_tp_mesh():
    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs 4 devices")
    mesh = make_dp_tp_mesh(tp=2)
    assert mesh.shape == {"dp": n // 2, "tp": 2}
    with pytest.raises(ValueError):
        make_dp_tp_mesh(tp=3)


def test_host_local_batch():
    assert host_local_batch(8) == 8  # single process: full batch local


def test_model_weight_bytes():
    from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params

    params = init_llama_params(TINY_LLAMA, seed=0)
    b = model_weight_bytes(params)
    assert b > 0


def test_tied_embeddings_loader(tmp_path, rng):
    """config with tie_word_embeddings and no lm_head.weight reuses the
    embedding matrix as the head."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from quantizations_tpu.models.hf_loader import load_hf_llama

    H, V = 128, 256
    cfgj = {
        "vocab_size": V, "hidden_size": H, "intermediate_size": 256,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 2, "head_dim": 64,
        "tie_word_embeddings": True,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfgj))
    t = {
        "model.embed_tokens.weight":
            rng.standard_normal((V, H)).astype(np.float32) * 0.05,
        "model.norm.weight": np.ones(H, np.float32),
    }
    for pfx, shape in [
        ("self_attn.q_proj", (128, H)), ("self_attn.k_proj", (128, H)),
        ("self_attn.v_proj", (128, H)), ("self_attn.o_proj", (H, 128)),
        ("mlp.gate_proj", (256, H)), ("mlp.up_proj", (256, H)),
        ("mlp.down_proj", (H, 256)),
    ]:
        t[f"model.layers.0.{pfx}.weight"] = (
            rng.standard_normal(shape).astype(np.float32) * 0.05)
        t["model.layers.0.input_layernorm.weight"] = np.ones(H, np.float32)
        t["model.layers.0.post_attention_layernorm.weight"] = np.ones(
            H, np.float32)
    save_file(t, str(tmp_path / "model.safetensors"))

    cfg, params = load_hf_llama(str(tmp_path))
    assert cfg.tie_word_embeddings
    # quantized head built from the embedding weight (default fp4 runtime
    # layout is the SWAR pair layout: [V/2, H/4])
    assert params.lm_head.out_features == V
    assert params.lm_head.in_features == H
    assert params.lm_head.wp.shape == (V // 2, H // 4)
