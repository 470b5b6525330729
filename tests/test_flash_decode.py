"""Flash-decode attention kernel vs the reference XLA attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.ops.attention import flash_decode_attention


def _ref_attention(q, k, v, lengths):
    # cache layout: [B, KVH, S, D]
    B, KVH, G, D = q.shape
    qf = q.astype(np.float32) * (D ** -0.5)
    out = np.zeros((B, KVH, G, D), np.float32)
    for b in range(B):
        for h in range(KVH):
            s = qf[b, h] @ k[b, h].T.astype(np.float32)  # [G, S]
            s[:, lengths[b]:] = -np.inf
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ v[b, h].astype(np.float32)
    return out


@pytest.mark.parametrize("B,KVH,G,S,lens", [
    (1, 2, 4, 256, [200]),
    (2, 2, 4, 512, [512, 17]),
    (3, 1, 8, 256, [1, 128, 255]),
])
def test_flash_decode_matches_reference(rng, B, KVH, G, S, lens):
    D = 128
    q = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
    k = (rng.standard_normal((B, KVH, S, D)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((B, KVH, S, D)) * 0.3).astype(np.float32)
    out = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lens, jnp.int32), s_blk=128, interpret=True))
    ref = _ref_attention(q, k, v, lens)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def _ref_attention_knobs(q, k, v, lengths, scale=None, softcap=None,
                         window=None):
    B, KVH, G, D = q.shape
    qf = q.astype(np.float32) * (scale if scale is not None else D ** -0.5)
    out = np.zeros((B, KVH, G, D), np.float32)
    for b in range(B):
        for h in range(KVH):
            s = qf[b, h] @ k[b, h].T.astype(np.float32)  # [G, S]
            if softcap is not None:
                s = softcap * np.tanh(s / softcap)
            s[:, lengths[b]:] = -np.inf
            if window is not None:
                lim = lengths[b] - 1 - window   # attend iff pos > lim
                s[:, :max(lim + 1, 0)] = -np.inf
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, h] = p @ v[b, h].astype(np.float32)
    return out


@pytest.mark.parametrize("scale,softcap,window", [
    (None, None, 96),          # Mistral sliding window
    (None, 50.0, None),        # Gemma-2 attn softcap
    (0.11, 30.0, 128),         # all knobs at once (Gemma-2 sliding layer)
])
def test_flash_decode_family_knobs(rng, scale, softcap, window):
    B, KVH, G, S, D = 2, 2, 4, 512, 128
    lens = [512, 130]
    q = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
    k = (rng.standard_normal((B, KVH, S, D)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((B, KVH, S, D)) * 0.3).astype(np.float32)
    out = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lens, jnp.int32), s_blk=128, interpret=True,
        scale=scale, softcap=softcap, window=window))
    ref = _ref_attention_knobs(q, k, v, lens, scale, softcap, window)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_flash_decode_stacked_traced_window(rng):
    """The stacked kernel's window arrives TRACED (scalar-prefetch):
    a huge value must disable the mask (global layer), a small one must
    match the windowed reference."""
    from quantizations_tpu.ops.attention import (
        flash_decode_attention_stacked)

    L, B, KVH, G, S, D = 2, 2, 1, 4, 256, 128
    lens = [256, 100]
    q = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
    ck = (rng.standard_normal((L, B, KVH, S, D)) * 0.3).astype(np.float32)
    cv = (rng.standard_normal((L, B, KVH, S, D)) * 0.3).astype(np.float32)
    for li in range(L):
        for win, ref_win in [(jnp.int32(64), 64), (jnp.int32(2**30), None)]:
            out = np.asarray(flash_decode_attention_stacked(
                jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv),
                jnp.int32(li), jnp.asarray(lens, jnp.int32),
                s_blk=128, interpret=True, window=win))
            ref = _ref_attention_knobs(q, ck[li], cv[li], lens,
                                       window=ref_win)
            np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_flash_decode_bf16_cache(rng):
    B, KVH, G, S, D = 1, 2, 2, 256, 128
    q = rng.standard_normal((B, KVH, G, D)).astype(np.float32)
    k = (rng.standard_normal((B, KVH, S, D)) * 0.3).astype(np.float32)
    v = (rng.standard_normal((B, KVH, S, D)) * 0.3).astype(np.float32)
    out = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(k, jnp.bfloat16).astype(jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray([200], jnp.int32),
        s_blk=128, interpret=True))
    ref = _ref_attention(
        q, np.asarray(jnp.asarray(k, jnp.bfloat16), np.float32),
        np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32), [200])
    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=5e-4)
