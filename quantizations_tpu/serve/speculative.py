"""Prompt-lookup speculative decoding (greedy-exact).

Batch-1 decode is HBM-bound: every step streams all packed weights for
ONE token. Verifying K drafted tokens in a single forward streams the
weights once for up to K+... accepted tokens — the fused pair kernel
(ops/qmatmul.py) is nearly batch-flat for small T, so acceptance
translates almost 1:1 into decode TPS.

The drafter is model-free "prompt lookup": propose the K tokens that
followed the most recent earlier occurrence of the current bigram in the
token history (prompt + generated so far). Drafts cost nothing and hit
often on natural text (quotes, code, templated spans). Verification is
exact greedy: the emitted stream is IDENTICAL to token-by-token greedy
decoding, whatever the drafts are (tested).

No reference analogue — the reference rides HF ``model.generate``
batch-1 (reference README.md:118-121); this is a TPU-native serving
feature enabled by the batch-flat decode kernel.

Temperature 0: acceptance is argmax equality (greedy-exact stream).
Temperature > 0: exact speculative sampling (``spec_accept_sample`` +
the bonus-slot rule in ``spec_window_tokens``) — the emitted stream is
distributed as ordinary temperature sampling whatever the drafts are.

Numerics caveat (standard for speculative decoding): the T=K verify
forward and the T=1 sequential forward differ in low-order float bits,
so a near-tied argmax can flip — the emitted stream is greedy-exact
w.r.t. the VERIFY forward's numerics (bit-identical to sequential on
the fp32 CPU path, tested; on-chip bf16 ties may diverge, which random
-weight models hit constantly and trained models rarely).

Measured (v5e, random weights): zero-acceptance worst case costs 11%
(48.8 vs 54.9 tok/s on 8B — the pair kernel is nearly batch-flat, so a
K=8 verify streams weights once for 8 slots); at the tiny preset's
measured 2.2 tokens/verify-step the same acceptance on a weight-bound
8B decode translates ~1:1 into TPS.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..config import ServeConfig
from ..models.llama import KVCache, LlamaConfig, LlamaParams, prefill

__all__ = ["make_speculative_generate_fn", "draft_prompt_lookup",
           "spec_accept_sample", "spec_accept_sample_vec",
           "spec_window_tokens"]


def spec_accept_sample(logits, draft, key, temperature: float):
    """Exact speculative sampling against a DETERMINISTIC draft.

    For proposal q = delta(draft), standard speculative sampling
    reduces to: accept the draft token with probability p(draft);
    on rejection sample from p with the draft token's mass removed
    (renormalized) — the combined law is exactly p (tested
    distributionally). temperature == 0 degrades to greedy argmax
    acceptance.

    logits [B, K, V], draft [B, K] -> (ok [B, K] accept mask,
    corr [B, K] correction token per position).
    """
    B, K, V = logits.shape
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature == 0.0:
        return draft == g, g
    lt = logits / jnp.float32(temperature)
    probs = jax.nn.softmax(lt, axis=-1)
    pd = jnp.take_along_axis(probs, draft[..., None], axis=-1)[..., 0]
    ku, ks = jax.random.split(key)
    u = jax.random.uniform(ku, (B, K))
    ok = u < pd
    # correction: sample from p with the draft token zeroed out
    masked = jnp.where(
        jax.nn.one_hot(draft, V, dtype=bool), -jnp.inf, lt)
    corr = jax.random.categorical(ks, masked, axis=-1).astype(jnp.int32)
    return ok, corr


def spec_window_tokens(okk, corr, draft):
    """Resolve one verify window: which tokens are emitted.

    okk/corr from :func:`spec_accept_sample` over the K verify
    positions; draft [B, K]. Only drafts ``[:, :K-1]`` were FED, so the
    window emits at most K tokens: ``a`` leading accepted drafts plus
    one decision token. Returns ``(g [B, K], a [B])`` where the emitted
    tokens are ``g[:, :a+1]``.

    The decision token at position ``a``: for ``a < K-1`` it is the
    rejection's correction sample ``corr[:, a]``; for ``a == K-1``
    (every fed draft accepted) position K-1 is the *bonus* slot and its
    own acceptance event ``okk[:, K-1]`` decides draft-vs-correction —
    always emitting ``corr`` there would zero out draft[K-1]'s
    probability mass and bias the stream (greedy: both equal argmax).
    """
    B, K = draft.shape
    ok = okk[:, :K - 1]
    a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    bonus_ok = (a == K - 1) & okk[:, K - 1]
    g = jnp.where(idx < a[:, None], draft, corr)
    g = jnp.where((idx == a[:, None]) & bonus_ok[:, None], draft, g)
    return g, a


def spec_accept_sample_vec(logits, draft, key, temps):
    """Per-row-temperature variant of :func:`spec_accept_sample` for the
    continuous-batching engine (each slot carries its own resolved
    temperature; 0 = greedy argmax acceptance for that row).

    logits [B, K, V], draft [B, K], temps [B] -> (ok [B, K], corr [B, K]).
    """
    B, K, V = logits.shape
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lt = logits / jnp.maximum(temps, 1e-6)[:, None, None]
    probs = jax.nn.softmax(lt, axis=-1)
    pd = jnp.take_along_axis(probs, draft[..., None], axis=-1)[..., 0]
    ku, ks = jax.random.split(key)
    u = jax.random.uniform(ku, (B, K))
    masked = jnp.where(
        jax.nn.one_hot(draft, V, dtype=bool), -jnp.inf, lt)
    corr_t = jax.random.categorical(ks, masked, axis=-1).astype(jnp.int32)
    greedy = (temps == 0.0)[:, None]
    ok = jnp.where(greedy, draft == g, u < pd)
    corr = jnp.where(greedy, g, corr_t)
    return ok, corr


def draft_prompt_lookup(hist: jnp.ndarray, hcnt: jnp.ndarray,
                        k: int) -> jnp.ndarray:
    """Propose ``k`` tokens per row from the most recent earlier match
    of the current bigram in ``hist[:, :hcnt]``.

    hist: [B, S] token history (prompt + generated), hcnt: [B] valid
    lengths (>= 2). Rows with no match propose a repeat of the last
    token — any draft is sound, verification rejects bad ones.
    """
    B, S = hist.shape
    j = jnp.arange(S, dtype=jnp.int32)[None, :]
    last1 = jnp.take_along_axis(hist, (hcnt - 1)[:, None], axis=1)
    last2 = jnp.take_along_axis(hist, (hcnt - 2)[:, None], axis=1)
    nxt = jnp.concatenate([hist[:, 1:], hist[:, :1]], axis=1)  # hist[j+1]
    match = ((hist == last2) & (nxt == last1)
             & (j + 1 < (hcnt - 1)[:, None]))       # strictly earlier
    jm = jnp.max(jnp.where(match, j, -1), axis=1)   # [B] last match or -1
    start = jnp.where(jm >= 0, jm + 2, (hcnt - 1))  # draft source offset

    def take_k(row, s):
        return jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([row, row[:k]]), s, k)  # wrap-safe

    return jax.vmap(take_k)(hist, jnp.minimum(start, S - 1))


def _spec_impl(
    params: LlamaParams,
    prompt_ids: jnp.ndarray,      # [B, P]
    cache: KVCache,
    key: jnp.ndarray,
    cfg: LlamaConfig,
    max_new_tokens: int,
    draft_k: int,
    temperature: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Returns (tokens [B, max_new_tokens], accept_steps, cache).

    ``accept_steps`` is the number of verify forwards used — the
    decode-weight-stream count; plain greedy would use
    ``max_new_tokens``."""
    B, P = prompt_ids.shape
    N = max_new_tokens
    K = draft_k
    if cache.max_seq < P + N + K:
        raise ValueError(
            f"cache max_seq {cache.max_seq} < prompt {P} + "
            f"max_new_tokens {N} + draft_k {K} (the verify forward "
            "writes up to K positions past the final token)")

    from .generate import sample_logits

    logits, cache = prefill(params, prompt_ids, cache, cfg,
                            last_token_only=True)
    key, sub = jax.random.split(key)
    t0 = sample_logits(logits[:, -1, :], sub, temperature)

    S_hist = P + N + K + 2
    hist = jnp.zeros((B, S_hist), jnp.int32)
    hist = jax.lax.dynamic_update_slice(hist, prompt_ids, (0, 0))
    hist = jax.vmap(lambda h, t: h.at[P].set(t))(hist, t0)
    hcnt = jnp.full((B,), P + 1, jnp.int32)

    out = jnp.zeros((B, N + K), jnp.int32)
    out = jax.vmap(lambda o, t: o.at[0].set(t))(out, t0)

    # carry: pending token per row, cache write position, emitted count,
    # history, verify-step counter
    state = dict(
        pending=t0,
        # t0 is sampled but not yet fed: its key lands at position P in
        # the first verify forward
        pos=jnp.full((B,), P, jnp.int32),
        cnt=jnp.ones((B,), jnp.int32),
        hist=hist, hcnt=hcnt, out=out, cache=cache,
        steps=jnp.int32(0), key=key,
    )

    def cond(s):
        return jnp.min(s["cnt"]) < N

    def body(s):
        draft = draft_prompt_lookup(s["hist"], s["hcnt"], K)   # [B, K]
        feed = jnp.concatenate(
            [s["pending"][:, None], draft[:, :K - 1]], axis=1)  # [B, K]
        logits, cache = prefill(params, feed, s["cache"], cfg,
                                pos=s["pos"])
        key, sub = jax.random.split(s["key"])
        okk, corr = spec_accept_sample(logits, draft, sub, temperature)
        # position i's acceptance covers draft[i] (fed at position i+1);
        # draft[K-1] is never fed, so the window emits at most K tokens
        g, a = spec_window_tokens(okk, corr, draft)
        # rows that already emitted N tokens freeze (no emission, no
        # pos advance): otherwise a finished row's pos keeps growing by
        # K per step while slower rows drain, and the clamped cache
        # writes would corrupt its valid KV tail
        live_row = s["cnt"] < N
        emit_n = jnp.where(live_row, a + 1, 0)                  # [0, K]

        idx = jnp.arange(K, dtype=jnp.int32)[None, :]
        live = idx < emit_n[:, None]
        # append g[:, :emit_n] to out at cnt and to hist at hcnt
        def scatter(buf, base, vals, live):
            pos = jnp.clip(base[:, None] + idx, 0, buf.shape[1] - 1)
            onehot = (pos[:, :, None]
                      == jnp.arange(buf.shape[1])[None, None, :])
            upd = jnp.sum(
                jnp.where(live[:, :, None] & onehot, vals[:, :, None], 0),
                axis=1)
            written = jnp.any(live[:, :, None] & onehot, axis=1)
            return jnp.where(written, upd, buf)

        out = scatter(s["out"], s["cnt"], g, live)
        hist = scatter(s["hist"], s["hcnt"], g, live)
        pending = jnp.take_along_axis(g, a[:, None], axis=1)[:, 0]
        return dict(
            pending=pending,
            pos=s["pos"] + emit_n,
            cnt=s["cnt"] + emit_n,
            hist=hist, hcnt=s["hcnt"] + emit_n, out=out, cache=cache,
            steps=s["steps"] + 1, key=key,
        )

    state = jax.lax.while_loop(cond, body, state)
    return state["out"][:, :N], state["steps"], state["cache"]


def make_speculative_generate_fn(
    cfg: LlamaConfig,
    serve: ServeConfig,
    draft_k: int = 8,
) -> Callable:
    """Jitted speculative generate: ``(params, prompt_ids, cache, key)
    -> (tokens [B, max_new_tokens], verify_steps, cache)``.

    temperature == 0: greedy, token-identical to ``make_generate_fn``.
    temperature > 0: exact speculative sampling (``spec_accept_sample``)
    — the emitted stream is distributed as ordinary temperature
    sampling whatever the drafts are.

    ``draft_k`` must keep the verify forward inside the fused pair
    kernel band (<= 256 rows incl. batch) — 8 is a good default: the
    kernel is nearly batch-flat there and misdrafts waste little."""
    fn = functools.partial(
        _spec_impl, cfg=cfg, max_new_tokens=serve.max_new_tokens,
        draft_k=draft_k, temperature=serve.temperature)
    donate = (2,) if serve.donate_cache else ()
    return jax.jit(fn, donate_argnums=donate)
