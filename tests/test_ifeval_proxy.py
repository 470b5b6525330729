"""IFEval-proxy harness + dense-twin mode (QuantConfig.dense_twin).

The dense twin is the accuracy-comparison arm of the IFEval proxy run
(VERDICT r3 ask #4): same params, same Engine, but every projection
computes with the transient dequantized bf16 weights on the MXU. These
tests pin (a) the twin's numerics against the independent dense
reference forward in evals/parity, (b) the end-to-end proxy harness on
the tiny model, (c) dataset coverage of all 25 official instruction ids.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import QuantConfig, ServeConfig
from quantizations_tpu.evals.ifeval import OFFICIAL_INSTRUCTION_IDS
from quantizations_tpu.evals.ifeval_proxy import (
    PROXY_DATASET,
    detokenize,
    encode_prompt,
    run_ifeval_proxy,
)
from quantizations_tpu.models.llama import (
    KVCache,
    TINY_LLAMA,
    init_llama_params,
    prefill,
)


def test_dataset_covers_all_official_ids():
    covered = set()
    for ex in PROXY_DATASET:
        assert set(ex) == {"key", "prompt", "instruction_id_list", "kwargs"}
        assert len(ex["instruction_id_list"]) == len(ex["kwargs"])
        covered.update(ex["instruction_id_list"])
    assert covered == set(OFFICIAL_INSTRUCTION_IDS)


def test_tokenizer_deterministic_and_text_shaped():
    ids = encode_prompt("Describe the harbor market.", 1000)
    assert ids == encode_prompt("Describe the harbor market.", 1000)
    text = detokenize(range(512))
    # the vocabulary must engage the checkers: words, commas,
    # paragraph breaks, placeholders, highlights, all-caps words
    assert " the " in text and "," in text and "\n\n" in text
    assert "[name]" in text and "*highlighted*" in text
    assert "WARNING" in text


@pytest.mark.parametrize("quant_type", ["fp4", "nf4"])
def test_dense_twin_matches_dense_reference(quant_type):
    """The in-jit dense-twin forward must agree with the independent
    dense reference forward (evals/parity._dense_forward) to within
    attention-implementation noise — same weight values by
    construction, different attention kernels."""
    from quantizations_tpu.evals.parity import (
        _dense_forward,
        dequantized_params,
    )

    cfg = dataclasses.replace(TINY_LLAMA, quant=QuantConfig(
        quant_type=quant_type))
    params = init_llama_params(cfg, seed=3, dist="trained_proxy")
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 16)),
        jnp.int32)

    twin_cfg = dataclasses.replace(cfg, quant=dataclasses.replace(
        cfg.quant, dense_twin=True))
    cache = KVCache.create(twin_cfg, 1, 16)
    twin_logits, _ = jax.jit(
        lambda p, t, c: prefill(p, t, c, twin_cfg))(params, ids, cache)

    dense = dequantized_params(params, cfg)
    ref_logits = jax.jit(
        lambda p, t: _dense_forward(p, t, cfg))(dense, ids)

    tl = np.asarray(twin_logits, np.float32)
    rl = np.asarray(ref_logits, np.float32)
    assert np.argmax(tl[0, -1]) == np.argmax(rl[0, -1])
    scale = np.abs(rl).max() + 1e-6
    assert np.abs(tl - rl).max() / scale < 0.05


def test_dense_twin_close_to_quantized_path():
    """Weight-only quantization: the twin and the 4-bit kernels compute
    over the SAME weight values, so logits differ only by projection
    arithmetic (bf16 rounding/reduction order)."""
    cfg = dataclasses.replace(TINY_LLAMA, quant=QuantConfig())
    params = init_llama_params(cfg, seed=5, dist="trained_proxy")
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12)),
        jnp.int32)

    q_logits, _ = jax.jit(lambda p, t, c: prefill(p, t, c, cfg))(
        params, ids, KVCache.create(cfg, 2, 12))
    twin_cfg = dataclasses.replace(cfg, quant=dataclasses.replace(
        cfg.quant, dense_twin=True))
    t_logits, _ = jax.jit(lambda p, t, c: prefill(p, t, c, twin_cfg))(
        params, ids, KVCache.create(twin_cfg, 2, 12))

    ql = np.asarray(q_logits, np.float32)
    tl = np.asarray(t_logits, np.float32)
    agree = (ql.argmax(-1) == tl.argmax(-1)).mean()
    assert agree > 0.9
    assert np.abs(ql - tl).max() / (np.abs(ql).max() + 1e-6) < 0.05


def test_run_ifeval_proxy_tiny_end_to_end():
    out = run_ifeval_proxy(preset="tiny", max_new_tokens=12, slots=2,
                           proxy=False)
    for side in ("quantized", "dense_twin"):
        d = out[side]
        assert d["prompt_total"] == len(PROXY_DATASET)
        assert d["skipped_instructions"] == 0
        assert 0.0 <= d["instruction_accuracy"] <= 1.0
    assert 0.0 <= out["verdict_agreement"] <= 1.0
    assert abs(out["deltas"]["instruction_accuracy"]) <= 1.0
