"""Continuous-batching serving engine.

No reference analogue (the reference is strictly batch-1 single-GPU,
SURVEY.md §2.3) — this is the new TPU-native serving design required by
BASELINE.json config 5: a slot-based engine where every batch slot holds
an independent request at its own sequence position. Decode steps run
the whole batch through ONE jitted program (per-slot positions are a
vector, see models/llama.py); finished slots are refilled from the queue
without stopping the others.

Single-host here; the multi-host path runs the same engine per host with
the TP-sharded step function (parallel/shard.py) and replicated host
queues — decode steps are synchronized by the collectives themselves.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Any, Deque, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServeConfig
from ..models.llama import (
    KVCache,
    LlamaConfig,
    LlamaParams,
    decode_step,
    prefill,
)
__all__ = ["Request", "Engine"]


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: List[int]
    max_new_tokens: int
    eos_id: Optional[int] = None
    temperature: Optional[float] = None   # None = engine default
    top_k: Optional[int] = None           # None = engine default
    top_p: Optional[float] = None         # None = engine default
    # filled by the engine:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


def draft_lookup_host(hist: List[int], k: int) -> List[int]:
    """Host-side prompt-lookup drafter: the ``k`` tokens following the
    most recent strictly-earlier occurrence of the current TRIGRAM,
    falling back to the bigram (the device ``draft_prompt_lookup``
    rule); pads with the last token. A trigram match is a stronger
    predictor when it exists (fewer false continuations on repeated
    bigrams), and any draft is sound — verification rejects bad ones.
    Python over a few-thousand-token history is ~µs — far under the
    device dispatch it rides along with."""
    n = len(hist)
    if n >= 3:
        t3, t2, t1 = hist[-3], hist[-2], hist[-1]
        for j in range(n - 4, -1, -1):
            if hist[j] == t3 and hist[j + 1] == t2 and hist[j + 2] == t1:
                src = hist[j + 3:j + 3 + k]
                return (src + [t1] * k)[:k]
    if n >= 2:
        b2, b1 = hist[-2], hist[-1]
        for j in range(n - 3, -1, -1):
            if hist[j] == b2 and hist[j + 1] == b1:
                src = hist[j + 2:j + 2 + k]
                return (src + [b1] * k)[:k]
    return [hist[-1] if hist else 0] * k


def sample_rows(logits: jnp.ndarray, temps: jnp.ndarray,
                key: jnp.ndarray, *, top_k=0,
                top_p=1.0) -> jnp.ndarray:
    """Per-row temperature sampling: rows with ``temps == 0`` take the
    greedy argmax, others a categorical draw over the
    temperature-scaled (and top-k/top-p truncated) logits.

    ``top_k`` / ``top_p`` may each be a python scalar (static under
    jit — the truncation code is only emitted when enabled) or a
    per-row traced array ([rows] int / float; ``top_k == 0`` and
    ``top_p >= 1`` mean "no truncation" per row). The traced form pays
    one vocab sort per call, but only at RUNTIME when some row actually
    truncates — a ``lax.cond`` skips the sort when every row is at the
    defaults, so greedy/temperature-only serving keeps its fast path
    inside a single compiled program. Shared by the slot Engine
    (decode/prefill/spec paths) and the PagedEngine so the sampling
    semantics can't drift."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lt = logits / jnp.maximum(temps, 1e-6)[:, None]
    if isinstance(top_k, jnp.ndarray) or isinstance(top_p, jnp.ndarray):
        V = lt.shape[-1]
        rows = lt.shape[0]
        ks = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (rows,))
        ps = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (rows,))

        def _trunc(x):
            # one descending sort serves both truncations: the top-k
            # mask applied to the sorted copy IS the sorted masked
            # array (masked entries are exactly the tail)
            srt = jnp.sort(x, axis=-1)[:, ::-1]
            kk = jnp.where(ks <= 0, V, ks)
            kth = jnp.take_along_axis(
                srt, jnp.clip(kk - 1, 0, V - 1)[:, None], axis=-1)
            x = jnp.where(x < kth, -jnp.inf, x)
            probs = jax.nn.softmax(
                jnp.where(srt < kth, -jnp.inf, srt), axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < ps[:, None]
            thr = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                          keepdims=True)
            return jnp.where(x < thr, -jnp.inf, x)

        lt = jax.lax.cond(
            jnp.any(ks > 0) | jnp.any(ps < 1.0), _trunc,
            lambda x: x, lt)
    else:
        if top_k > 0:
            kth = jnp.sort(lt, axis=-1)[:, -top_k][:, None]
            lt = jnp.where(lt < kth, -jnp.inf, lt)
        if top_p < 1.0:
            srt = jnp.sort(lt, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(srt, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < jnp.float32(top_p)
            thr = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                          keepdims=True)
            lt = jnp.where(lt < thr, -jnp.inf, lt)
    sampled = jax.random.categorical(key, lt, axis=-1).astype(jnp.int32)
    return jnp.where(temps == 0.0, greedy, sampled)


def sample_rows_samp(logits: jnp.ndarray, samp: jnp.ndarray,
                     key: jnp.ndarray) -> jnp.ndarray:
    """:func:`sample_rows` over a packed per-row sampling matrix
    ``samp`` [rows, 3] = (temperature, top_k, top_p) — the traced
    per-request form both engines dispatch with (one array argument
    keeps every step/prefill/spec signature unchanged)."""
    return sample_rows(logits, samp[:, 0], key,
                       top_k=samp[:, 1].astype(jnp.int32),
                       top_p=samp[:, 2])


def iter_prefill_chunks(plen: int, buckets, max_len: int = 0,
                        base: int = 0) -> list:
    """(start, take, bucket_len) triples covering a prompt of ``plen``
    tokens with bucket-shaped prefill chunks (shared by the slot Engine
    and the PagedEngine so the padding/bucketing semantics can't
    drift).

    ``max_len``/``base``: the prefill writes ``bucket_len`` positions at
    ``base + start`` of a cache of length ``max_len``; when the final
    padded chunk would overrun, ``dynamic_update_slice`` clamp-shifts
    the write and silently scatters KV to WRONG positions. With
    ``max_len`` set, the final chunk is instead shifted back so the
    window ends exactly at ``max_len``, re-feeding already-prefilled
    tokens (a deterministic recompute of identical KV — the window
    attends the valid cache prefix below it) and growing ``take`` so
    the last real token stays at window offset ``take - 1``.
    """
    buckets = tuple(sorted(buckets))
    out = []
    start = 0
    while start < plen:
        take = min(plen - start, buckets[-1])
        blen = next(b for b in buckets if take <= b)
        out.append((start, take, blen))
        start += take
    if max_len and out:
        start, take, blen = out[-1]
        if base + start + blen > max_len:
            if blen > max_len or base + plen > max_len:
                raise ValueError(
                    f"prefill bucket {blen} cannot fit: base {base} + "
                    f"plen {plen} vs cache length {max_len}")
            start = max_len - blen - base   # may reach below ``base``
            out[-1] = (start, plen - start, blen)
    return out


def clamp_buckets(buckets, max_seq: int) -> tuple:
    """Prefill buckets wider than the cache can never be written
    without clamping; drop them (shared by both engines)."""
    return (tuple(b for b in sorted(buckets) if b <= max_seq)
            or (max_seq,))


def run_chunk_rounds(entries, n_rows, default_starts, dispatch) -> dict:
    """Drive batched chunk-round prefills (shared by the slot Engine and
    the PagedEngine — the round assembly carries the harmless-garbage
    invariants and must not drift between them).

    ``entries``: (row, prompt_ids, cov, chunks) per admission, chunks
    from :func:`iter_prefill_chunks` over ``len(prompt_ids) - cov``.
    Rows that exhaust their chunks early become garbage rounds writing
    at ``len(prompt_ids)`` (past their valid prefix — never attended,
    never scattered). ``dispatch(ids, starts, plens) -> tok[row]`` runs
    one round. Returns {row: sampled token of the final real round}.
    """
    rounds = max(len(c) for _, _, _, c in entries)
    out: dict = {}
    for j in range(rounds):
        blen = max(c[j][2] for _, _, _, c in entries if j < len(c))
        ids = np.zeros((n_rows, blen), np.int32)
        starts = np.asarray(default_starts, np.int32).copy()
        plens = np.ones(n_rows, np.int32)
        for row, prompt, cov, c in entries:
            if j >= len(c):
                starts[row] = len(prompt)   # garbage round
                continue
            start, take, _ = c[j]
            ids[row, :take] = prompt[cov + start:cov + start + take]
            starts[row] = cov + start
            plens[row] = take
        tok = dispatch(ids, starts, plens)
        for row, _, _, c in entries:
            if j == len(c) - 1:
                out[row] = int(tok[row])
    return out


class Engine:
    """Slot-based continuous batching over a fixed-shape KV cache.

    ``slots`` concurrent sequences; prompts are bucketed to
    ``prefill_buckets`` lengths so the jitted prefill has a small, fixed
    set of shapes (XLA needs static shapes; bucketing is the standard
    TPU answer to variable-length prompts).
    """

    def __init__(
        self,
        params: LlamaParams,
        cfg: LlamaConfig,
        serve: ServeConfig,
        slots: int = 4,
        prefill_buckets: tuple = (16, 64, 256),
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
        mesh=None,
    ):
        """``mesh``: a tp mesh (parallel.make_mesh) — params must already
        be placed with ``shard_llama_params``; the engine's step/prefill
        run under shard_map with the TP collectives."""
        self.params = params
        self.cfg = cfg
        self.serve = serve
        self.slots = slots
        self.max_seq = serve.max_seq_len
        self.buckets = clamp_buckets(prefill_buckets, self.max_seq)
        self.mesh = mesh

        self._temp = temperature
        self._top_k, self._top_p = top_k, top_p
        self.on_token = None   # optional callable(Request, token_id)
        # pluggable speculative drafter: (hist tokens, k) -> k draft
        # ids. Default = host prompt-lookup; harnesses inject replay/
        # oracle drafters to measure verify-window efficiency at a
        # CONTROLLED acceptance rate (benchmarks/engine_probe.py
        # --workload replay), and callers can plug a real draft model.
        self.draft_fn = draft_lookup_host
        self.pos = np.zeros(slots, np.int32)         # next write offset
        self.active: List[Optional[Request]] = [None] * slots
        self.queue: Deque[Request] = deque()
        self.finished: Dict[int, Request] = {}
        self._uid = 0
        self._key = jax.random.PRNGKey(seed)
        self._cur_tok = np.zeros(slots, np.int32)
        self._steps = 0

        axis = None
        kv_shard = cfg.num_key_value_heads
        if mesh is not None:
            from ..parallel.shard import AXIS

            axis = AXIS
            kv_shard //= mesh.shape[AXIS]

        # step: batched decode + sample, cache donated. Params are an
        # explicit argument (closing over multi-GB arrays would lift
        # them into jaxpr constants). One compiled variant per attention
        # bucket: the step only attends the valid cache prefix (at 8k
        # max_seq a full-cache read would be ~1 GB/token).
        # Per-slot sampling with a traced [slots, 3] matrix of
        # (temperature, top_k, top_p): greedy (temp 0) or categorical
        # per request, with PER-REQUEST truncation — the engine-level
        # top_k/top_p are only defaults for requests that leave theirs
        # unset. The truncation sort runs under a lax.cond, so
        # all-default batches keep the sort-free fast path at runtime.
        # Shared by the decode step AND the prefill closure so a
        # request's resolved sampling params govern its FIRST emitted
        # token too. (Speculative accept windows remain
        # temperature-only: exact accept/correct math is defined
        # against the untruncated target distribution — see step_spec.)
        _sample = sample_rows_samp

        def _make_step(attend_len):
            def _step(p, tokens, cache, pos_vec, samp, key):
                logits, cache = decode_step(
                    p, tokens[:, None], cache, pos_vec, cfg,
                    axis_name=axis, attend_len=attend_len)
                nxt = _sample(logits, samp, key)
                return nxt, cache

            return _step

        # multi-step: scan ``n`` decode steps in ONE dispatch. Each
        # host->device round trip costs real latency (through the axon
        # tunnel ~45 ms — it DOMINATED the engine: 75 ms/step vs the
        # 21 ms jitted step at 8 slots); batching n steps amortizes it
        # at the cost of coarser admission/retirement granularity
        # (slots that finish mid-window generate throwaway tokens for
        # the remainder — bounded by n-1 per request).
        def _make_multi_step(attend_len, n):
            one = _make_step(attend_len)

            def _multi(p, tokens, cache, pos_vec, samp, key):
                def body(carry, k):
                    tok, cache, pos = carry
                    nxt, cache = one(p, tok, cache, pos, samp, k)
                    return (nxt, cache, pos + 1), tok

                keys = jax.random.split(key, n)
                (tok, cache, _), emitted = jax.lax.scan(
                    body, (tokens, cache, pos_vec), keys)
                # emitted[j] = token vector BEFORE step j; the final
                # carry token is the next pending token per slot
                return tok, emitted.T, cache   # [slots], [slots, n]

            return _multi

        # speculative verify window: feed [slots, K] = pending token +
        # K-1 drafts at per-slot positions, accept/correct per slot with
        # its own temperature. Rejected-draft keys above the committed
        # position are garbage that the next window (written at the new,
        # lower-or-equal base) overwrites before any query attends it —
        # the same invariant the chunked prefill relies on.
        def _make_spec_step(attend_len, k):
            from .speculative import (spec_accept_sample_vec,
                                      spec_window_tokens)

            def _spec(p, feed, cache, pos_vec, draft, samp, key):
                logits, cache = prefill(
                    p, feed, cache, cfg, axis_name=axis, pos=pos_vec,
                    attend_len=attend_len)
                okk, corr = spec_accept_sample_vec(logits, draft, key,
                                                   samp[:, 0])
                g, a = spec_window_tokens(okk, corr, draft)
                return g, a, cache

            return _spec

        # chunked prefill of ONE sequence into a scratch cache (later
        # inserted into the batch cache at a slot): each chunk is a
        # bucket-shaped slice written at ``start`` — prompts longer than
        # the largest bucket prefill in several passes (queries of a
        # later chunk attend the earlier chunks' keys through the cache).
        # Padding caveat: positions [start+plen, start+bucket) hold
        # garbage keys, but the NEXT chunk (or decode) overwrites
        # position p before any query can attend it, so they are never
        # read.
        def _pf(p, ids, scratch, start, plen, samp, key):
            # ids [1, blen] left-aligned; positions 0..plen-1 valid.
            # ``samp`` [1, 3] is the request's RESOLVED
            # (temperature, top_k, top_p) (traced — baking the engine
            # default here would make a temp-0 request's first token
            # stochastic).
            logits, scratch = prefill(p, ids, scratch, cfg,
                                      axis_name=axis, pos=start)
            # logits of the LAST VALID token in this chunk
            logit = jnp.take_along_axis(
                logits, jnp.reshape(plen - 1, (1, 1, 1)), axis=1)[:, 0]
            tok = _sample(logit, samp, key)
            return tok, scratch

        # Batched admission: prefill chunks for EVERY admitted request
        # in ONE dispatch, writing straight into the batch cache at
        # per-row positions (no per-request scratch cache + insert).
        # Rows of slots that are not being admitted this round carry
        # zero tokens at their CURRENT position: the garbage K/V they
        # write at [pos, pos+blen) is overwritten by future decode
        # steps before any query can attend it (the same invariant the
        # chunk padding already relies on). The host measured one
        # ~45 ms tunnel round trip per prefill chunk per request —
        # admission dominated the engine at many queued requests; this
        # batches it to one round trip per chunk ROUND.
        def _pf_batch(p, ids, cache, starts, plens, samp, key):
            logits, cache = prefill(p, ids, cache, cfg,
                                    axis_name=axis, pos=starts)
            logit = jnp.take_along_axis(
                logits, (plens - 1)[:, None, None], axis=1)[:, 0]
            tok = _sample(logit, samp, key)
            return tok, cache

        def _fresh_scratch():
            # GLOBAL scratch (full kv heads; the mesh sharding splits it
            # — the per-shard kv count only applies inside shard_map)
            scratch = KVCache.create(cfg, 1, self.max_seq)
            if mesh is not None:
                from jax.sharding import NamedSharding

                from ..parallel.shard import cache_pspec

                scratch = jax.tree.map(
                    lambda x, sp: jax.device_put(
                        x, NamedSharding(mesh, sp)),
                    scratch, cache_pspec(cfg))
            return scratch

        self._fresh_scratch = _fresh_scratch

        if mesh is None:
            self.cache = KVCache.create(cfg, slots, self.max_seq)

            def build_step(attend_len):
                return jax.jit(_make_step(attend_len), donate_argnums=(2,))

            def build_multi_step(attend_len, n):
                return jax.jit(_make_multi_step(attend_len, n),
                               donate_argnums=(2,))

            def build_spec_step(attend_len, k):
                return jax.jit(_make_spec_step(attend_len, k),
                               donate_argnums=(2,))

            pf = jax.jit(_pf, donate_argnums=(2,))
            pfb = jax.jit(_pf_batch, donate_argnums=(2,))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.shard import cache_pspec, llama_param_pspecs

            pspecs = llama_param_pspecs(
                cfg, fused=params.layers.qkv is not None)
            cspec = cache_pspec(cfg)
            self.cache = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                KVCache.create(cfg, slots, self.max_seq), cspec)

            def build_step(attend_len):
                return jax.jit(jax.shard_map(
                    _make_step(attend_len), mesh=mesh,
                    in_specs=(pspecs, P(None), cspec, P(None),
                              P(None, None), P(None)),
                    out_specs=(P(None), cspec),
                    check_vma=False,
                ), donate_argnums=(2,))

            def build_multi_step(attend_len, n):
                return jax.jit(jax.shard_map(
                    _make_multi_step(attend_len, n), mesh=mesh,
                    in_specs=(pspecs, P(None), cspec, P(None),
                              P(None, None), P(None)),
                    out_specs=(P(None), P(None, None), cspec),
                    check_vma=False,
                ), donate_argnums=(2,))

            def build_spec_step(attend_len, k):
                return jax.jit(jax.shard_map(
                    _make_spec_step(attend_len, k), mesh=mesh,
                    in_specs=(pspecs, P(None, None), cspec, P(None),
                              P(None, None), P(None, None), P(None)),
                    out_specs=(P(None, None), P(None), cspec),
                    check_vma=False,
                ), donate_argnums=(2,))

            pf = jax.jit(jax.shard_map(
                _pf, mesh=mesh,
                in_specs=(pspecs, P(None, None), cspec, P(), P(),
                          P(None, None), P(None)),
                out_specs=(P(None), cspec),
                check_vma=False,
            ), donate_argnums=(2,))
            pfb = jax.jit(jax.shard_map(
                _pf_batch, mesh=mesh,
                in_specs=(pspecs, P(None, None), cspec, P(None), P(None),
                          P(None, None), P(None)),
                out_specs=(P(None), cspec),
                check_vma=False,
            ), donate_argnums=(2,))
        self._build_step = build_step
        self._build_multi_step = build_multi_step
        self._build_spec_step = build_spec_step
        self._step_fns: Dict[int, Any] = {}
        self._multi_fns: Dict[Any, Any] = {}
        self._spec_fns: Dict[Any, Any] = {}
        self._spec_windows = 0
        # speculative acceptance accounting (VERDICT r3 #6): drafted =
        # k-1 lookup tokens offered per slot-window; accepted = drafts
        # that committed. rate = accepted/drafted is the number that
        # says whether a workload pays for drafting.
        self._spec_drafted = 0
        self._spec_accepted = 0
        self._prefill_fn = functools.partial(pf, params)
        self._prefill_batch_fn = functools.partial(pfb, params)
        self._params = params

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _insert(cache, scratch, slot):
            k = jax.lax.dynamic_update_slice(
                cache.k, scratch.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache.v, scratch.v, (0, slot, 0, 0, 0))
            if cache.k_scale is None:
                return KVCache(k=k, v=v)
            return KVCache(
                k=k, v=v,
                k_scale=jax.lax.dynamic_update_slice(
                    cache.k_scale, scratch.k_scale, (0, slot, 0, 0)),
                v_scale=jax.lax.dynamic_update_slice(
                    cache.v_scale, scratch.v_scale, (0, slot, 0, 0)))

        self._insert_fn = _insert

    def _step_for(self, attend_len: int):
        fn = self._step_fns.get(attend_len)
        if fn is None:
            fn = functools.partial(self._build_step(attend_len),
                                   self._params)
            self._step_fns[attend_len] = fn
        return fn

    def _attend_bucket(self, extra: int = 0) -> int:
        """Smallest power-of-two >= live max position + 1 + ``extra``
        (floor 128), capped at max_seq. ``extra`` is the window
        headroom: n-1 future steps or k-1 speculative positions."""
        need = int(self.pos.max()) + 1 + extra
        b = 128
        while b < need:
            b *= 2
        return min(b, self.max_seq)

    # -- public API --------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens: int = 32,
               eos_id: Optional[int] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None) -> int:
        # validate HERE: a rejection mid-_admit would strand requests
        # popped in the same admission round
        if len(prompt_ids) >= self.max_seq:
            raise ValueError(
                f"prompt length {len(prompt_ids)} >= max_seq "
                f"{self.max_seq}")
        self._uid += 1
        self.queue.append(Request(
            uid=self._uid, prompt_ids=list(map(int, prompt_ids)),
            max_new_tokens=max_new_tokens, eos_id=eos_id,
            temperature=temperature, top_k=top_k, top_p=top_p))
        return self._uid

    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.active)

    def step(self) -> int:
        """Admit queued requests into free slots, run one batched decode
        step, retire finished requests. Returns #active slots stepped."""
        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        self._key, sub = jax.random.split(self._key)
        tokens = jnp.asarray(self._cur_tok)
        pos_vec = jnp.asarray(self.pos)
        samp = self._slot_samp()
        step_fn = self._step_for(self._attend_bucket())
        nxt, self.cache = step_fn(tokens, self.cache, pos_vec,
                                  jnp.asarray(samp), sub)
        nxt = np.asarray(nxt)
        self._steps += 1
        for i in act:
            r = self.active[i]
            r.output_ids.append(int(self._cur_tok[i]))
            if self.on_token is not None:
                self.on_token(r, r.output_ids[-1])
            self.pos[i] += 1
            self._cur_tok[i] = nxt[i]
            full = len(r.output_ids) >= r.max_new_tokens
            hit_eos = (r.eos_id is not None
                       and r.output_ids[-1] == r.eos_id)
            out_of_room = self.pos[i] >= self.max_seq - 1
            if full or hit_eos or out_of_room:
                r.done = True
                self.finished[r.uid] = r
                self.active[i] = None
                self.pos[i] = 0   # retired rows must not pin the
                #                   attend bucket (masked per-row anyway)
        return len(act)

    def _multi_for(self, attend_len: int, n: int):
        fn = self._multi_fns.get((attend_len, n))
        if fn is None:
            fn = functools.partial(
                self._build_multi_step(attend_len, n), self._params)
            self._multi_fns[(attend_len, n)] = fn
        return fn

    def step_window(self, n: int) -> int:
        """Run ``n`` decode steps in ONE device dispatch (amortizes the
        host round trip; admission/retirement happen at window
        boundaries, so finished slots waste at most ``n - 1`` step-slots
        of throwaway tokens)."""
        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        self._key, sub = jax.random.split(self._key)
        samp = self._slot_samp()
        fn = self._multi_for(self._attend_bucket(extra=n), n)
        nxt, emitted, self.cache = fn(
            jnp.asarray(self._cur_tok), self.cache,
            jnp.asarray(self.pos), jnp.asarray(samp), sub)
        nxt = np.asarray(nxt)
        emitted = np.asarray(emitted)          # [slots, n]
        self._steps += n
        for i in act:
            r = self.active[i]
            for j in range(n):
                r.output_ids.append(int(emitted[i, j]))
                if self.on_token is not None:
                    self.on_token(r, r.output_ids[-1])
                self.pos[i] += 1
                full = len(r.output_ids) >= r.max_new_tokens
                hit_eos = (r.eos_id is not None
                           and r.output_ids[-1] == r.eos_id)
                out_of_room = self.pos[i] >= self.max_seq - 1
                if full or hit_eos or out_of_room:
                    r.done = True
                    self.finished[r.uid] = r
                    self.active[i] = None
                    self.pos[i] = 0
                    break
            else:
                self._cur_tok[i] = nxt[i]
        return len(act)

    def _spec_for(self, attend_len: int, k: int):
        fn = self._spec_fns.get((attend_len, k))
        if fn is None:
            fn = functools.partial(
                self._build_spec_step(attend_len, k), self._params)
            self._spec_fns[(attend_len, k)] = fn
        return fn

    def step_spec(self, k: int = 8) -> int:
        """One speculative verify window across all active slots: each
        slot's pending token + k-1 host-drafted (prompt-lookup) tokens
        go through ONE prefill-shaped forward; accepted tokens commit
        per slot. Emits 1..k tokens per slot per dispatch — the
        continuous-batching form of serve/speculative.py. Greedy slots
        stream token-identically to the plain engine (tested); the
        temperature>0 rule is exact per-row speculative sampling."""
        self._admit()
        act = [i for i, r in enumerate(self.active) if r is not None]
        if not act:
            return 0
        # a verify window writes k keys at pos: any slot too close to
        # the cache end falls back to ONE plain step (which runs requests
        # to max_seq - 1 exactly like the non-speculative engine — the
        # streams stay token-identical at the cache boundary)
        if any(self.pos[i] + k > self.max_seq - 1 for i in act):
            return self.step()
        slots = self.slots
        feed = np.zeros((slots, k), np.int32)
        draft = np.zeros((slots, k), np.int32)
        for i in act:
            r = self.active[i]
            hist = r.prompt_ids + r.output_ids + [int(self._cur_tok[i])]
            d = self.draft_fn(hist, k)
            draft[i] = d
            feed[i, 0] = self._cur_tok[i]
            feed[i, 1:] = d[:k - 1]
        samp = self._slot_samp()
        self._key, sub = jax.random.split(self._key)
        fn = self._spec_for(self._attend_bucket(extra=k), k)
        g, a, self.cache = fn(
            jnp.asarray(feed), self.cache, jnp.asarray(self.pos),
            jnp.asarray(draft), jnp.asarray(samp), sub)
        g = np.asarray(g)
        a = np.asarray(a)
        self._steps += 1
        self._spec_windows += 1
        self._spec_drafted += (k - 1) * len(act)
        self._spec_accepted += int(sum(min(int(a[i]), k - 1) for i in act))
        for i in act:
            r = self.active[i]
            # committed this window: the pending token + a[i] accepted
            # drafts; the decision token g[i, a[i]] becomes the next
            # pending (its key is not in the cache yet)
            toks = [int(self._cur_tok[i])] + [int(t) for t in
                                              g[i, :int(a[i])]]
            done = False
            for t in toks:
                r.output_ids.append(t)
                if self.on_token is not None:
                    self.on_token(r, t)
                self.pos[i] += 1
                full = len(r.output_ids) >= r.max_new_tokens
                hit_eos = r.eos_id is not None and t == r.eos_id
                out_of_room = self.pos[i] >= self.max_seq - 1
                if full or hit_eos or out_of_room:
                    r.done = done = True
                    self.finished[r.uid] = r
                    self.active[i] = None
                    self.pos[i] = 0
                    break
            if not done:
                self._cur_tok[i] = int(g[i, int(a[i])])
        return len(act)

    def run(self, max_steps: int = 100000,
            steps_per_dispatch: int = 1,
            spec_k: int = 0) -> Dict[int, Request]:
        while self.has_work() and self._steps < max_steps:
            if spec_k > 0:
                self.step_spec(spec_k)
            elif steps_per_dispatch > 1:
                self.step_window(steps_per_dispatch)
            else:
                self.step()
        return self.finished

    def stats(self) -> Dict[str, Any]:
        """Live engine counters (observability; SURVEY.md §5 metrics)."""
        live = sum(1 for r in self.active if r is not None)
        return {
            "steps": self._steps,
            "spec_windows": self._spec_windows,
            "spec_drafted": self._spec_drafted,
            "spec_accepted": self._spec_accepted,
            "spec_accept_rate": (self._spec_accepted / self._spec_drafted
                                 if self._spec_drafted else 0.0),
            "active_slots": live,
            "queued": len(self.queue),
            "finished": len(self.finished),
            "emitted_tokens": sum(len(r.output_ids)
                                  for r in self.finished.values())
            + sum(len(r.output_ids) for r in self.active
                  if r is not None),
        }

    def recover(self) -> int:
        """Failure recovery (SURVEY.md §5): after a device error, requeue
        every in-flight request with its prompt extended by the tokens
        already generated (outputs are preserved; the re-admit prefill
        resumes exactly where the sequence left off under greedy
        sampling) and reset the cache. Returns #requests requeued.

        Multi-host note: each host runs its own engine; a failed host's
        queue is re-dispatched by re-submitting its unfinished requests
        to a healthy host's engine via this same requeue shape.
        """
        n = 0
        for i, r in enumerate(self.active):
            if r is None:
                continue
            r.prompt_ids = r.prompt_ids + r.output_ids
            self.queue.appendleft(r)
            self.active[i] = None
            n += 1
        self.pos[:] = 0
        self._cur_tok[:] = 0
        self.cache = jax.tree.map(jnp.zeros_like, self.cache)
        return n

    # -- internals ----------------------------------------------------------

    def _resolved_temp(self, r: Optional[Request]) -> float:
        if r is None or r.temperature is None:
            return self._temp
        return r.temperature

    def _resolved_samp(self, r: Optional[Request]):
        """(temperature, top_k, top_p) with engine defaults filled in
        (top_k rides a float32 row — exact for any real vocab size)."""
        if r is None:
            return (self._temp, float(self._top_k), self._top_p)
        return (self._temp if r.temperature is None else r.temperature,
                float(self._top_k if r.top_k is None else r.top_k),
                self._top_p if r.top_p is None else r.top_p)

    def _slot_samp(self) -> np.ndarray:
        """[slots, 3] resolved (temperature, top_k, top_p) rows
        (greedy/no-truncation for empty slots)."""
        out = np.zeros((self.slots, 3), np.float32)
        out[:, 2] = 1.0
        for i, r in enumerate(self.active):
            if r is not None:
                out[i] = self._resolved_samp(r)
        return out

    def _admit(self) -> None:
        """Admit queued requests into every free slot.

        Batched path: one ``_pf_batch`` dispatch per chunk ROUND covers
        all admitted requests at once, prefilling straight into the
        batch cache (measured: per-request-per-chunk dispatches through
        the ~45 ms tunnel round trip dominated the engine under load).
        Falls back to the scratch-cache path only when a LIVE slot sits
        too close to ``max_seq`` for the harmless-garbage-write
        invariant (the batched prefill writes ``blen`` positions at
        every row; near the cache end the clamped write would corrupt a
        live row's valid tail).
        """
        free = [i for i in range(self.slots) if self.active[i] is None]
        if not free or not self.queue:
            return
        admits = []                       # (slot, request, chunks)
        for slot in free:
            if not self.queue:
                break
            r = self.queue.popleft()      # length validated at submit
            admits.append((slot, r,
                           iter_prefill_chunks(len(r.prompt_ids),
                                               self.buckets,
                                               max_len=self.max_seq)))
        max_blen = max(bl for _, _, c in admits for _, _, bl in c)
        live = [i for i in range(self.slots)
                if self.active[i] is not None]
        tight = (
            any(self.pos[i] + max_blen > self.max_seq for i in live)
            or any(len(r.prompt_ids) + max_blen > self.max_seq
                   for _, r, _ in admits))
        if tight:
            self._admit_scratch(admits)
            return

        samp = np.zeros((self.slots, 3), np.float32)
        samp[:, 2] = 1.0
        for i in range(self.slots):
            r = next((r for sl, r, _ in admits if sl == i),
                     self.active[i])
            samp[i] = self._resolved_samp(r)

        def dispatch(ids, starts, plens):
            self._key, sub = jax.random.split(self._key)
            tok, self.cache = self._prefill_batch_fn(
                jnp.asarray(ids), self.cache, jnp.asarray(starts),
                jnp.asarray(plens), jnp.asarray(samp), sub)
            return np.asarray(tok)

        toks = run_chunk_rounds(
            [(slot, r.prompt_ids, 0, chunks)
             for slot, r, chunks in admits],
            self.slots, self.pos, dispatch)
        for slot, tok in toks.items():
            self._cur_tok[slot] = tok
        for slot, r, chunks in admits:
            self.active[slot] = r
            self.pos[slot] = len(r.prompt_ids)

    def _admit_scratch(self, admits) -> None:
        """Per-request scratch-cache admission (the pre-batching path;
        used when the batch cache is too full for in-place prefill)."""
        for slot, r, chunks in admits:
            self._key, sub = jax.random.split(self._key)
            scratch = self._fresh_scratch()
            rsamp = np.asarray([self._resolved_samp(r)], np.float32)
            for start, take, blen in chunks:
                ids = np.zeros((1, blen), np.int32)
                ids[0, :take] = r.prompt_ids[start:start + take]
                tok, scratch = self._prefill_fn(
                    jnp.asarray(ids), scratch, jnp.int32(start),
                    jnp.int32(take), jnp.asarray(rsamp), sub)
            self.cache = self._insert_fn(self.cache, scratch,
                                         jnp.int32(slot))
            self.active[slot] = r
            self.pos[slot] = len(r.prompt_ids)
            self._cur_tok[slot] = int(np.asarray(tok)[0])
