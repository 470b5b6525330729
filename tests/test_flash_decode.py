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
