"""Model-layer tests (SURVEY.md §4 config 4, scaled to a tiny model).

Validates the KV-cache/generate machinery: decode-with-cache must
reproduce full-prefill logits, and the jitted generate loop must be
deterministic under greedy sampling.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache,
    TINY_LLAMA,
    decode_step,
    init_llama_params,
    prefill,
)
from quantizations_tpu.serve.generate import make_generate_fn

CFG = TINY_LLAMA
MAX_SEQ = 32


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, seed=0)


def test_prefill_shapes(params):
    B, P = 2, 8
    cache = KVCache.create(CFG, B, MAX_SEQ)
    ids = jnp.arange(B * P, dtype=jnp.int32).reshape(B, P) % CFG.vocab_size
    logits, cache = jax.jit(
        functools.partial(prefill, cfg=CFG)
    )(params, ids, cache)
    assert logits.shape == (B, P, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # cache written at positions [0, P): the P-1 row must be nonzero
    # (layout [L, B, KV, S, D])
    assert float(jnp.abs(cache.k[0, 0, :, P - 1]).max()) > 0
    assert float(jnp.abs(cache.k[0, 0, :, P]).max()) == 0


def test_decode_matches_prefill(params):
    """Prefill of N tokens == prefill of P then N-P cached decode steps.

    This is the correctness proof of the cache indexing, RoPE positions
    and attention mask."""
    B, P, N = 1, 5, 9
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, N)), jnp.int32)

    full_logits, _ = jax.jit(functools.partial(prefill, cfg=CFG))(
        params, ids, KVCache.create(CFG, B, MAX_SEQ))

    logits_p, cache = jax.jit(functools.partial(prefill, cfg=CFG))(
        params, ids[:, :P], KVCache.create(CFG, B, MAX_SEQ))
    step = jax.jit(functools.partial(decode_step, cfg=CFG))
    got = [logits_p[:, -1, :]]
    for t in range(P, N):
        logits_t, cache = step(params, ids[:, t:t + 1], cache, jnp.int32(t))
        got.append(logits_t)
    # got[i] is the logits after token P-1+i == full_logits[:, P-1+i]
    for i, g in enumerate(got[:-1]):
        ref = full_logits[:, P - 1 + i, :]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref), rtol=0, atol=2e-2,
        )


def test_generate_greedy_deterministic(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=6,
                        temperature=0.0)
    gen = make_generate_fn(CFG, serve)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    key = jax.random.PRNGKey(0)
    t1, _ = gen(params, ids, KVCache.create(CFG, 1, MAX_SEQ), key)
    t2, _ = gen(params, ids, KVCache.create(CFG, 1, MAX_SEQ), key)
    assert t1.shape == (1, 6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert int(t1.max()) < CFG.vocab_size and int(t1.min()) >= 0


def test_generate_sampled_in_range(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.8, top_k=10)
    gen = make_generate_fn(CFG, serve)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    toks, _ = gen(params, ids, KVCache.create(CFG, 1, MAX_SEQ),
                  jax.random.PRNGKey(7))
    assert toks.shape == (1, 5)
    assert int(toks.max()) < CFG.vocab_size and int(toks.min()) >= 0


def test_flash_attention_decode_matches_einsum(params):
    """Decode with the flash-decode kernel must match the XLA einsum
    attention path."""
    import dataclasses

    cfg_f = dataclasses.replace(CFG, use_flash_attention=True)
    B, P, N = 1, 5, 8
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, N)), jnp.int32)

    logits_p, cache = jax.jit(functools.partial(prefill, cfg=CFG))(
        params, ids[:, :P], KVCache.create(CFG, B, MAX_SEQ))
    step_ref = jax.jit(functools.partial(decode_step, cfg=CFG))
    step_fl = jax.jit(functools.partial(decode_step, cfg=cfg_f))
    cache2 = jax.tree.map(lambda x: x, cache)
    for t in range(P, N):
        l_ref, cache = step_ref(params, ids[:, t:t + 1], cache, jnp.int32(t))
        l_fl, cache2 = step_fl(params, ids[:, t:t + 1], cache2, jnp.int32(t))
        np.testing.assert_allclose(np.asarray(l_fl), np.asarray(l_ref),
                                   rtol=0, atol=3e-2)


@pytest.mark.parametrize("knobs", [
    # Mistral: every layer slides
    dict(sliding_window=6),
    # Gemma-2: alternating window + softcap + query scale
    dict(sliding_window=6, sliding_layers="even",
         attn_logit_softcap=50.0, query_scale=24),
])
def test_flash_decode_family_knobs_match_einsum(params, knobs):
    """Sliding-window / softcap / query-scale configs must produce the
    same decode logits through the flash kernel as through the einsum
    path (the round-1 gate forced einsum for these families)."""
    import dataclasses

    cfg_e = dataclasses.replace(CFG, **knobs)
    cfg_f = dataclasses.replace(cfg_e, use_flash_attention=True)
    B, P, N = 2, 5, 9
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, N)), jnp.int32)

    _, cache = jax.jit(functools.partial(prefill, cfg=cfg_e))(
        params, ids[:, :P], KVCache.create(cfg_e, B, MAX_SEQ))
    step_ref = jax.jit(functools.partial(decode_step, cfg=cfg_e))
    step_fl = jax.jit(functools.partial(decode_step, cfg=cfg_f))
    cache2 = jax.tree.map(lambda x: x, cache)
    for t in range(P, N):
        l_ref, cache = step_ref(params, ids[:, t:t + 1], cache,
                                jnp.int32(t))
        l_fl, cache2 = step_fl(params, ids[:, t:t + 1], cache2,
                               jnp.int32(t))
        np.testing.assert_allclose(np.asarray(l_fl), np.asarray(l_ref),
                                   rtol=0, atol=3e-2)


def test_bf16_scales_footprint_option():
    """scales_dtype=bfloat16 halves scale bytes; generation stays close
    to the fp32-scales model."""
    import dataclasses

    from quantizations_tpu.config import QuantConfig

    cfg_b = dataclasses.replace(
        CFG, quant=QuantConfig(scales_dtype=jnp.bfloat16))
    p32 = init_llama_params(CFG, seed=0)
    p16 = init_llama_params(cfg_b, seed=0)
    assert p16.layers.q.scales.dtype == jnp.bfloat16
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    l32, _ = jax.jit(functools.partial(prefill, cfg=CFG))(
        p32, ids, KVCache.create(CFG, 1, MAX_SEQ))
    l16, _ = jax.jit(functools.partial(prefill, cfg=cfg_b))(
        p16, ids, KVCache.create(CFG, 1, MAX_SEQ))
    # bf16 scale rounding: small logit drift, same scale of outputs
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                               rtol=0, atol=0.3)


def test_quantized_embedding_and_footprint():
    """quantize_embedding + bf16 scales: same generation quality class,
    ~25% of bf16 weight bytes."""
    import dataclasses

    from quantizations_tpu.config import QuantConfig
    from quantizations_tpu.utils.profiling import model_weight_bytes

    cfg_q = dataclasses.replace(CFG, quant=QuantConfig(
        quantize_embedding=True, scales_dtype=jnp.bfloat16))
    p_ref = init_llama_params(CFG, seed=0)
    p_q = init_llama_params(cfg_q, seed=0)
    from quantizations_tpu.models.llama import QLinear

    assert isinstance(p_q.embed, QLinear)
    assert model_weight_bytes(p_q) < model_weight_bytes(p_ref)

    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=5,
                        temperature=0.0, donate_cache=False)
    gen = make_generate_fn(cfg_q, serve)
    ids = jnp.asarray([[3, 1, 4, 1]], jnp.int32)
    toks, _ = gen(p_q, ids, KVCache.create(cfg_q, 1, MAX_SEQ),
                  jax.random.PRNGKey(0))
    assert toks.shape == (1, 5)
    assert int(toks.max()) < CFG.vocab_size


def test_sliding_window_masks_old_positions():
    """With sliding_window=W, logits at position p ignore keys at
    positions <= p - W: shifting far-past cache content must not change
    the output, while near-past content must."""
    import dataclasses

    import numpy as np

    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, decode_step, init_llama_params)

    W = 4
    cfg = dataclasses.replace(TINY_LLAMA, sliding_window=W)
    params = init_llama_params(cfg, seed=0)
    B, S = 1, 16
    rng = np.random.default_rng(0)

    def run(cache_bytes):
        cache = KVCache(k=jnp.asarray(cache_bytes[0]),
                        v=jnp.asarray(cache_bytes[1]))
        tok = jnp.asarray([[7]], jnp.int32)
        logits, _ = decode_step(params, tok, cache,
                                jnp.asarray([10], jnp.int32), cfg)
        return np.asarray(logits)

    L = cfg.num_hidden_layers
    KV = cfg.num_key_value_heads
    D = cfg.head_dim
    base_k = rng.standard_normal((L, B, KV, S, D)).astype(np.float32)
    base_v = rng.standard_normal((L, B, KV, S, D)).astype(np.float32)

    a = run((base_k, base_v))
    # perturb positions 0..5 (all <= 10 - W = 6 -> outside the window...
    # window is (10-W, 10] = positions 7..10; 0..6 are masked)
    far_k, far_v = base_k.copy(), base_v.copy()
    far_k[:, :, :, :6] += 100.0
    far_v[:, :, :, :6] += 100.0
    b = run((far_k, far_v))
    np.testing.assert_array_equal(a, b)
    # perturbing an in-window position changes the logits
    near_k, near_v = base_k.copy(), base_v.copy()
    near_k[:, :, :, 9] += 1.0
    near_v[:, :, :, 9] += 1.0
    c = run((near_k, near_v))
    assert not np.allclose(a, c)
