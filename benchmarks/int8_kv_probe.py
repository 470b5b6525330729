"""int8 KV cache attention probe: flash-i8 vs flash-bf16 vs the einsum
path at decode shapes (Llama3-8B geometry, long context).

The int8 cache halves the dominant HBM stream (code bytes) at the cost
of in-VMEM column scalings; expected ~2x on the attention component at
HBM-bound shapes. Also times the end-to-end quantize-on-write cost via
a single decode-step einsum comparison.

Usage: python benchmarks/int8_kv_probe.py [CTX ...]   (default 1024 2048)
"""
import functools, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.ops.attention import (
    flash_decode_attention_stacked, flash_decode_attention_stacked_i8)
from quantizations_tpu.utils.timing import time_scan_chain

L, KVH, G, D = 32, 8, 4, 128     # Llama3-8B attention geometry


def run(B, S):
    rng = np.random.default_rng(0)
    kf = rng.standard_normal((L, B, KVH, S, D)).astype(np.float32) * 0.3
    vf = rng.standard_normal((L, B, KVH, S, D)).astype(np.float32) * 0.3
    step_k = np.abs(kf).max(-1) / 127.0
    step_v = np.abs(vf).max(-1) / 127.0
    ki = jnp.asarray(np.clip(np.round(kf / step_k[..., None]), -127, 127),
                     jnp.int8)
    vi = jnp.asarray(np.clip(np.round(vf / step_v[..., None]), -127, 127),
                     jnp.int8)
    sk = jnp.asarray(step_k, jnp.bfloat16)
    sv = jnp.asarray(step_v, jnp.bfloat16)
    kb = jnp.asarray(kf, jnp.bfloat16)
    vb = jnp.asarray(vf, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, KVH, G, D)), jnp.float32)
    lengths = jnp.full((B,), S, jnp.int32)
    li = jnp.int32(L // 2)

    bytes_bf = 2 * B * KVH * S * D * 2
    bytes_i8 = 2 * B * KVH * S * (D + 2)

    fb = jax.jit(functools.partial(flash_decode_attention_stacked))
    fi = jax.jit(functools.partial(flash_decode_attention_stacked_i8))

    ob = np.asarray(fb(q, kb, vb, li, lengths))
    oi = np.asarray(fi(q, ki, vi, sk, sv, li, lengths))
    rel = np.max(np.abs(oi - ob)) / (np.max(np.abs(ob)) + 1e-9)

    dtb = time_scan_chain(lambda qq, *c: fb(qq, *c, li, lengths), q,
                          iters=200, trials=2, consts=(kb, vb))
    dti = time_scan_chain(
        lambda qq, *c: fi(qq, *c, li, lengths), q,
        iters=200, trials=2, consts=(ki, vi, sk, sv))
    print(f"B={B} S={S:5d} flash_bf16 {dtb*1e6:8.1f}us "
          f"{bytes_bf/dtb/1e9:6.1f} GB/s | flash_i8 {dti*1e6:8.1f}us "
          f"{bytes_i8/dti/1e9:6.1f} GB/s ({dtb/dti:.2f}x, rel {rel:.1e})",
          flush=True)


if __name__ == "__main__":
    ctxs = [int(a) for a in sys.argv[1:]] or [1024, 2048]
    for B in (1, 8):
        for S in ctxs:
            run(B, S)
