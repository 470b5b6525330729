"""Autoregressive generation — the whole loop on device.

The reference measures 60 forced new tokens of HF ``model.generate``
(reference README.md:90-127), where every decoded token re-enters Python
and re-dispatches ~448 kernels (SURVEY.md §3.2). Here generation is ONE
jitted function: prefill, then ``lax.scan`` over decode steps, with the
KV cache donated so XLA updates it in place. Host↔device traffic per call
is the prompt in and the token ids out.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ServeConfig
from ..models.llama import (
    KVCache,
    LlamaConfig,
    LlamaParams,
    decode_step,
    prefill,
)

__all__ = ["sample_logits", "make_generate_fn", "generate", "GenerateResult"]


def sample_logits(
    logits: jnp.ndarray,        # [B, vocab] fp32
    key: jnp.ndarray,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Greedy (temperature 0) or temperature/top-k/top-p (nucleus)
    categorical sampling. Static knobs — the sampler is baked into the
    jitted loop; top-p keeps the smallest prefix of probability-sorted
    tokens whose mass reaches ``top_p``."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.float32(temperature)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        srt = jnp.sort(logits, axis=-1)[:, ::-1]          # descending
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < jnp.float32(top_p)  # mass BEFORE token
        thr = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                      keepdims=True)
        logits = jnp.where(logits < thr, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _pin_natural_layout(cache: KVCache) -> KVCache:
    """Constrain every cache array to the natural (row-major)
    major-to-minor layout. Opt-in via QT_PIN_CACHE_LAYOUT=1: under
    packed bf16x2 scales XLA's layout assignment flips the scan-carried
    cache into a permuted layout ({4,2,3,1,0}) and pays per-layer
    relayout copies in the decode body (the r5 trace-diff localization
    of the -9% b1 tax); pinning the carry natural was the surgical
    counter-move. RACED ON CHIP AND REFUTED (chain_r5h: bf16x2+pin
    56.05 vs unpinned 56.04 — the body still relayouts its cache
    SLICES for the attention einsum; the carry constraint is satisfied
    trivially). Kept as the documented experiment + CPU-testable
    machinery (flag=2 pins on any backend; 4 LayoutConstraint ops
    verified in the lowered HLO, tokens identical)."""
    import jax.experimental.layout as jl

    def pin(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return x
        return jl.with_layout_constraint(
            x, jl.Layout(tuple(range(x.ndim))))

    return jax.tree.map(pin, cache)


# 0 = off; 1 = pin on TPU; 2 = pin on any backend (CPU testing)
_PIN_CACHE_LAYOUT = int(
    __import__("os").environ.get("QT_PIN_CACHE_LAYOUT", "0"))


def _generate_impl(
    params: LlamaParams,
    prompt_ids: jnp.ndarray,    # [B, P] int32
    cache: KVCache,
    key: jnp.ndarray,
    cfg: LlamaConfig,
    max_new_tokens: int,
    temperature: float,
    top_k: int,
    top_p: float = 1.0,
    eos_id: Optional[int] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill + scan-decode. Returns (tokens [B, max_new_tokens], cache).

    ``eos_id`` set freezes a row to eos once it emits eos (no early exit
    — the scan length is static — but the row stops changing, matching
    HF ``generate`` semantics; the engine drains such slots for real)."""
    B, P = prompt_ids.shape
    logits, cache = prefill(params, prompt_ids, cache, cfg,
                            axis_name=axis_name, last_token_only=True)
    key, sub = jax.random.split(key)
    tok = sample_logits(logits[:, -1, :], sub, temperature, top_k, top_p)
    done = (jnp.full((B,), False) if eos_id is None
            else tok == jnp.int32(eos_id))

    do_pin = (_PIN_CACHE_LAYOUT and axis_name is None
              and (_PIN_CACHE_LAYOUT >= 2
                   or jax.default_backend() == "tpu"))
    if _PIN_CACHE_LAYOUT:
        import sys as _sys

        print(f"# pin_cache_layout: flag={_PIN_CACHE_LAYOUT} "
              f"backend={jax.default_backend()} do_pin={do_pin}",
              file=_sys.stderr, flush=True)
    if do_pin:
        cache = _pin_natural_layout(cache)

    def step(carry, _):
        tok, done, cache, pos, key = carry
        logits, cache = decode_step(params, tok[:, None], cache, pos, cfg,
                                    axis_name=axis_name)
        if do_pin:
            cache = _pin_natural_layout(cache)
        key, sub = jax.random.split(key)
        nxt = sample_logits(logits, sub, temperature, top_k, top_p)
        if eos_id is not None:
            nxt = jnp.where(done, jnp.int32(eos_id), nxt)
            done = done | (nxt == jnp.int32(eos_id))
        return (nxt, done, cache, pos + 1, key), nxt

    (_, _, cache, _, _), toks = jax.lax.scan(
        step, (tok, done, cache, jnp.int32(P), key), None,
        length=max_new_tokens - 1,
    )
    tokens = jnp.concatenate([tok[:, None], toks.T.astype(jnp.int32)], axis=1)
    return tokens, cache


def make_generate_fn(
    cfg: LlamaConfig,
    serve: ServeConfig,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build the jitted generate function for fixed static shapes.

    ``(params, prompt_ids, cache, key) -> (tokens, cache)``; the cache
    argument is donated (in-place update on device).
    """
    fn = functools.partial(
        _generate_impl,
        cfg=cfg,
        max_new_tokens=serve.max_new_tokens,
        temperature=serve.temperature,
        top_k=serve.top_k,
        top_p=serve.top_p,
        eos_id=serve.eos_id,
        axis_name=axis_name,
    )
    if axis_name is not None:
        return fn  # caller wraps in shard_map + jit
    donate = (2,) if serve.donate_cache else ()
    return jax.jit(fn, donate_argnums=donate)


@dataclasses.dataclass
class GenerateResult:
    tokens: jnp.ndarray          # [B, max_new_tokens]
    prefill_s: float
    decode_s: float
    tokens_per_s: float          # decode TPS, batch-summed
    per_seq_tps: float


def generate(
    params: LlamaParams,
    prompt_ids: jnp.ndarray,
    cfg: LlamaConfig,
    serve: ServeConfig,
    warmup: bool = True,
) -> GenerateResult:
    """Convenience wrapper: build cache + jitted fn, time prefill/decode.

    Timing mirrors the reference bench protocol (README.md:90-127):
    batch-1 style wall-clock over ``max_new_tokens`` forced tokens.
    """
    B, P = prompt_ids.shape
    gen = make_generate_fn(cfg, serve)
    key = jax.random.PRNGKey(serve.seed)

    def fresh_cache():
        return KVCache.create(cfg, B, serve.max_seq_len)

    if warmup:
        toks, _ = gen(params, prompt_ids, fresh_cache(), key)
        toks.block_until_ready()

    # Separate prefill timing: run a 1-token generate (prefill dominates).
    t0 = time.perf_counter()
    toks, cache = gen(params, prompt_ids, fresh_cache(), key)
    toks.block_until_ready()
    total_s = time.perf_counter() - t0

    # Estimate decode-only rate from a second run delta is noisy on a
    # tunnel; instead report total over new tokens (the reference's own
    # metric is also end-to-end generate time / new tokens).
    n_new = serve.max_new_tokens
    tps = n_new * B / total_s
    return GenerateResult(
        tokens=toks, prefill_s=0.0, decode_s=total_s,
        tokens_per_s=tps, per_seq_tps=n_new / total_s,
    )
