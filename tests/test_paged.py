"""Paged KV serving: block-table attention kernel, prefill scatter, and
decode equivalence with the slot cache (CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quantizations_tpu.models.llama import (
    KVCache, TINY_LLAMA, init_llama_params, prefill, decode_step)
from quantizations_tpu.serve.paged import (
    PageAllocator, PagedKVCache, insert_prefill, paged_decode_step)

CFG = TINY_LLAMA
PSZ = 16   # page size (multiple of 8 for Mosaic blocks)


def test_page_allocator():
    a = PageAllocator(8)
    p1 = a.alloc(3)
    assert len(set(p1)) == 3 and 0 not in p1
    a.free(p1)
    assert a.available == 7
    a.alloc(7)
    try:
        a.alloc(1)
        assert False
    except MemoryError:
        pass


def test_paged_decode_matches_slot_cache():
    """Prefill into a scratch, scatter to pages, then N paged decode
    steps produce the same greedy tokens as the slot-cache decode."""
    params = init_llama_params(CFG, seed=0)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    P = len(prompt)
    N = 6
    ids = jnp.asarray([prompt], jnp.int32)

    # reference: slot cache
    cache = KVCache.create(CFG, 1, 64)
    logits, cache = jax.jit(
        lambda p, i, c: prefill(p, i, c, CFG, last_token_only=True)
    )(params, ids, cache)
    ref = [int(jnp.argmax(logits[0, -1]))]
    step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, CFG))
    for i in range(N - 1):
        lg, cache = step(params, jnp.asarray([[ref[-1]]], jnp.int32),
                         cache, jnp.asarray([P + i], jnp.int32))
        ref.append(int(jnp.argmax(lg[0])))

    # paged: prefill scratch -> scatter -> paged decode
    pages = PagedKVCache.create(CFG, num_pages=8, page_size=PSZ)
    alloc = PageAllocator(8)
    scratch = KVCache.create(CFG, 1, 64)
    logits, scratch = jax.jit(
        lambda p, i, c: prefill(p, i, c, CFG, last_token_only=True)
    )(params, ids, scratch)
    got = [int(jnp.argmax(logits[0, -1]))]
    need = -(-(P + N) // PSZ)
    page_ids = alloc.alloc(need)
    pages = insert_prefill(pages, scratch, page_ids, P)
    table = np.zeros((1, 4), np.int32)
    table[0, :need] = page_ids
    tbl = jnp.asarray(table)
    for i in range(N - 1):
        lg, pages = paged_decode_step(
            params, jnp.asarray([[got[-1]]], jnp.int32), pages, tbl,
            jnp.asarray([P + i], jnp.int32), CFG, max_pages=2)
        got.append(int(jnp.argmax(lg[0])))

    assert got == ref, (got, ref)


@pytest.mark.parametrize("knobs", [
    # Mistral: every layer slides (window < live context to be binding)
    dict(sliding_window=6),
    # Gemma-2 family: sandwich norms, (1+w) gains, GeGLU, softcaps,
    # embed normalizer, query scale, alternating window
    dict(sliding_window=6, sliding_layers="even", post_norms=True,
         norm_plus_one=True, hidden_activation="gelu_tanh",
         embed_normalizer=True, attn_logit_softcap=50.0,
         final_logit_softcap=30.0, query_scale=24),
    # Qwen3: per-head q/k RMSNorm
    dict(qk_norm=True, attention_bias=False),
])
def test_paged_decode_family_knobs_match_slot(knobs):
    """The paged decode step must reproduce the slot-cache greedy stream
    for sliding-window / Gemma-2 / Qwen3 configs (round 1 gated these
    out of PagedEngine entirely)."""
    cfg = dataclasses.replace(TINY_LLAMA, **knobs)
    params = init_llama_params(cfg, seed=0)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    P = len(prompt)
    N = 6
    ids = jnp.asarray([prompt], jnp.int32)

    cache = KVCache.create(cfg, 1, 64)
    logits, cache = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg, last_token_only=True)
    )(params, ids, cache)
    ref = [int(jnp.argmax(logits[0, -1]))]
    step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, cfg))
    for i in range(N - 1):
        lg, cache = step(params, jnp.asarray([[ref[-1]]], jnp.int32),
                         cache, jnp.asarray([P + i], jnp.int32))
        ref.append(int(jnp.argmax(lg[0])))

    pages = PagedKVCache.create(cfg, num_pages=8, page_size=PSZ)
    alloc = PageAllocator(8)
    scratch = KVCache.create(cfg, 1, 64)
    logits, scratch = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg, last_token_only=True)
    )(params, ids, scratch)
    got = [int(jnp.argmax(logits[0, -1]))]
    need = -(-(P + N) // PSZ)
    page_ids = alloc.alloc(need)
    pages = insert_prefill(pages, scratch, page_ids, P)
    table = np.zeros((1, 4), np.int32)
    table[0, :need] = page_ids
    tbl = jnp.asarray(table)
    for i in range(N - 1):
        lg, pages = paged_decode_step(
            params, jnp.asarray([[got[-1]]], jnp.int32), pages, tbl,
            jnp.asarray([P + i], jnp.int32), cfg, max_pages=2)
        got.append(int(jnp.argmax(lg[0])))

    assert got == ref, (got, ref)


def test_paged_decode_two_sequences():
    """Two rows at different positions with disjoint pages stay
    independent (their greedy streams match isolated runs)."""
    params = init_llama_params(CFG, seed=1)
    prompts = [[3, 1, 4, 1], [2, 7, 1, 8, 2, 8, 1, 8]]
    N = 4

    def isolated(prompt):
        ids = jnp.asarray([prompt], jnp.int32)
        cache = KVCache.create(CFG, 1, 64)
        logits, cache = jax.jit(
            lambda p, i, c: prefill(p, i, c, CFG, last_token_only=True)
        )(params, ids, cache)
        out = [int(jnp.argmax(logits[0, -1]))]
        step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, CFG))
        for i in range(N - 1):
            lg, cache = step(params, jnp.asarray([[out[-1]]], jnp.int32),
                             cache, jnp.asarray([len(prompt) + i],
                                                jnp.int32))
            out.append(int(jnp.argmax(lg[0])))
        return out

    refs = [isolated(p) for p in prompts]

    pages = PagedKVCache.create(CFG, num_pages=10, page_size=PSZ)
    alloc = PageAllocator(10)
    table = np.zeros((2, 4), np.int32)
    toks = []
    for b, prompt in enumerate(prompts):
        scratch = KVCache.create(CFG, 1, 64)
        ids = jnp.asarray([prompt], jnp.int32)
        logits, scratch = jax.jit(
            lambda p, i, c: prefill(p, i, c, CFG, last_token_only=True)
        )(params, ids, scratch)
        toks.append(int(jnp.argmax(logits[0, -1])))
        need = -(-(len(prompt) + N) // PSZ)
        ids_p = alloc.alloc(need)
        pages = insert_prefill(pages, scratch, ids_p, len(prompt))
        table[b, :need] = ids_p
    tbl = jnp.asarray(table)
    got = [[t] for t in toks]
    pos = np.asarray([len(p) for p in prompts], np.int32)
    for i in range(N - 1):
        cur = jnp.asarray([[got[0][-1]], [got[1][-1]]], jnp.int32)
        lg, pages = paged_decode_step(
            params, cur, pages, tbl, jnp.asarray(pos), CFG, max_pages=2)
        for b in range(2):
            got[b].append(int(jnp.argmax(lg[b])))
        pos = pos + 1

    assert got[0] == refs[0], (got[0], refs[0])
    assert got[1] == refs[1], (got[1], refs[1])


def test_paged_verify_window_matches_sequential_decode():
    """paged_verify_step's K-query causal window (q_span kernel
    masking) must produce the same logits as feeding the K tokens one
    by one through paged_decode_step."""
    from quantizations_tpu.serve.paged import paged_verify_step

    params = init_llama_params(CFG, seed=0)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    P, K = len(prompt), 4
    window = [2, 7, 1, 8]
    ids = jnp.asarray([prompt], jnp.int32)

    def prep():
        pages = PagedKVCache.create(CFG, num_pages=8, page_size=PSZ)
        alloc = PageAllocator(8)
        scratch = KVCache.create(CFG, 1, 64)
        logits, scratch = jax.jit(
            lambda p, i, c: prefill(p, i, c, CFG, last_token_only=True)
        )(params, ids, scratch)
        need = -(-(P + K) // PSZ)
        page_ids = alloc.alloc(need)
        pages = insert_prefill(pages, scratch, page_ids, P)
        table = np.zeros((1, 4), np.int32)
        table[0, :need] = page_ids
        return pages, jnp.asarray(table)

    # sequential: K decode steps
    pages, tbl = prep()
    seq_logits = []
    for t in range(K):
        lg, pages = paged_decode_step(
            params, jnp.asarray([[window[t]]], jnp.int32), pages, tbl,
            jnp.asarray([P + t], jnp.int32), CFG, max_pages=2)
        seq_logits.append(np.asarray(lg[0]))

    # one verify window
    pages, tbl = prep()
    lg, pages = paged_verify_step(
        params, jnp.asarray([window], jnp.int32), pages, tbl,
        jnp.asarray([P], jnp.int32), CFG, max_pages=2)
    win_logits = np.asarray(lg[0])   # [K, vocab]

    for t in range(K):
        np.testing.assert_allclose(win_logits[t], seq_logits[t],
                                   rtol=0, atol=3e-2)


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_paged_engine_spec_matches_plain(kv_dtype):
    """run(spec_k=4): greedy streams token-identical to the plain
    paged engine (accepted drafts emit early, rejections correct —
    the slot engine's invariant over block tables), bf16 and int8."""
    from quantizations_tpu.serve.paged import PagedEngine

    cfg = dataclasses.replace(TINY_LLAMA, kv_cache_dtype=kv_dtype)
    params = init_llama_params(cfg, seed=0)
    # repetitive prompts so prompt-lookup drafts get real acceptances
    prompts = [[3, 1, 4, 3, 1, 4, 3, 1], [2, 7, 2, 7, 2, 7],
               [9, 9, 1, 2, 3]]
    lens = [8, 7, 5]

    def run(spec_k):
        eng = PagedEngine(params, cfg, num_pages=24, page_size=PSZ,
                          slots=2, max_seq=64, prefill_buckets=(8,))
        uids = [eng.submit(p, max_new_tokens=n)
                for p, n in zip(prompts, lens)]
        done = eng.run(spec_k=spec_k)
        return [done[u].output_ids for u in uids]

    ref = run(0)
    got = run(4)
    assert got == ref, (got, ref)


def test_paged_decode_int8_pool_matches_slot_cache():
    """kv_cache_dtype="int8": the int8 paged pool (code pages + step
    pages, i8 paged kernel) reproduces the int8 SLOT-cache greedy
    stream — same quantize-on-write semantics, page indirection only."""
    cfg8 = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")
    params = init_llama_params(cfg8, seed=0)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    P, N = len(prompt), 6
    ids = jnp.asarray([prompt], jnp.int32)

    cache = KVCache.create(cfg8, 1, 64)
    logits, cache = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg8, last_token_only=True)
    )(params, ids, cache)
    ref = [int(jnp.argmax(logits[0, -1]))]
    step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, cfg8))
    for i in range(N - 1):
        lg, cache = step(params, jnp.asarray([[ref[-1]]], jnp.int32),
                         cache, jnp.asarray([P + i], jnp.int32))
        ref.append(int(jnp.argmax(lg[0])))

    pages = PagedKVCache.create(cfg8, num_pages=8, page_size=PSZ)
    assert pages.pages_k.dtype == jnp.int8
    assert pages.k_scale.dtype == jnp.bfloat16
    alloc = PageAllocator(8)
    scratch = KVCache.create(cfg8, 1, 64)
    logits, scratch = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg8, last_token_only=True)
    )(params, ids, scratch)
    got = [int(jnp.argmax(logits[0, -1]))]
    need = -(-(P + N) // PSZ)
    page_ids = alloc.alloc(need)
    pages = insert_prefill(pages, scratch, page_ids, P)
    table = np.zeros((1, 4), np.int32)
    table[0, :need] = page_ids
    tbl = jnp.asarray(table)
    for i in range(N - 1):
        lg, pages = paged_decode_step(
            params, jnp.asarray([[got[-1]]], jnp.int32), pages, tbl,
            jnp.asarray([P + i], jnp.int32), cfg8, max_pages=2)
        got.append(int(jnp.argmax(lg[0])))

    assert got == ref, (got, ref)


def test_paged_engine_int8_close_to_bf16():
    """PagedEngine over the int8 pool: streams stay close to the bf16
    paged engine (int8 KV is a numerics knob, not an exact one)."""
    from quantizations_tpu.serve.paged import PagedEngine

    cfg8 = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")
    params = init_llama_params(cfg8, seed=0)
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8]]

    def run(cfg):
        eng = PagedEngine(params, cfg, num_pages=16, page_size=PSZ,
                          slots=2, max_seq=64, prefill_buckets=(8,))
        uids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        done = eng.run()
        return [done[u].output_ids for u in uids]

    ref = run(TINY_LLAMA)
    got = run(cfg8)
    agree = np.mean([t == r for ts, rs in zip(got, ref)
                     for t, r in zip(ts, rs)])
    assert agree >= 0.8, (got, ref)


def test_paged_engine_per_request_temperature():
    """A temperature=0 request in a temp>0 PagedEngine stays greedy
    (matches a pure-greedy engine), incl. its FIRST emitted token;
    sampled requests emit in-range tokens."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    prompt = [3, 1, 4, 1, 5]

    ref_eng = PagedEngine(params, CFG, num_pages=16, page_size=PSZ,
                          slots=2, max_seq=64, prefill_buckets=(8,))
    ru = ref_eng.submit(prompt, max_new_tokens=6)
    ref = ref_eng.run()[ru].output_ids

    eng = PagedEngine(params, CFG, num_pages=16, page_size=PSZ,
                      slots=2, max_seq=64, prefill_buckets=(8,),
                      temperature=0.9, seed=3)
    ug = eng.submit(prompt, max_new_tokens=6, temperature=0.0)
    us = eng.submit(prompt, max_new_tokens=6)   # engine default 0.9
    done = eng.run()
    assert done[ug].output_ids == ref, (done[ug].output_ids, ref)
    samp = done[us].output_ids
    assert len(samp) == 6
    assert all(0 <= t < CFG.vocab_size for t in samp)


@pytest.mark.parametrize("slots", [1, 2])
def test_paged_engine_prefix_cache_shares_pages(slots):
    """With prefix_cache=True, a repeated prompt prefix reuses pool
    pages (same block-table entries, fewer allocations) and the greedy
    streams stay identical to the uncached engine — through both the
    per-request (slots=1) and batched (slots=2) admission paths."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    # prompt long enough for 2 full pages (PSZ=16) + a partial tail
    base = [int(x) for x in
            np.random.default_rng(5).integers(1, CFG.vocab_size, 40)]
    prompts = [base, base[:36] + [7, 7, 7], base]   # shared 2-page prefix

    def run(prefix_cache):
        eng = PagedEngine(params, CFG, num_pages=32, page_size=PSZ,
                          slots=slots, max_seq=64,
                          prefill_buckets=(8, 16),
                          prefix_cache=prefix_cache)
        uids = [eng.submit(p, max_new_tokens=4) for p in prompts]
        done = eng.run()
        return eng, [done[u].output_ids for u in uids]

    eng_ref, streams_ref = run(False)
    eng_pc, streams_pc = run(True)
    assert streams_pc == streams_ref, (streams_pc, streams_ref)
    # the shared 2-page prefix is registered and pinned by the cache
    assert len(eng_pc._prefix) >= 2
    # cache-pinned pages remain out of the free list; everything a
    # request owned privately was returned
    pinned = len(eng_pc._prefix)
    assert eng_pc.alloc.available == 31 - pinned


def test_paged_engine_prefix_cache_evicts_under_pressure():
    """When the pool runs dry, LRU cache-pinned pages are evicted to
    satisfy new allocations (no MemoryError while evictable pages
    exist)."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    rng = np.random.default_rng(6)
    eng = PagedEngine(params, CFG, num_pages=8, page_size=PSZ,
                      slots=1, max_seq=64, prefill_buckets=(8, 16),
                      prefix_cache=True)
    # several distinct 2-page prompts: each pins 2 pages; a 7-page pool
    # can't hold them all, so later admissions must evict earlier pins
    for _ in range(4):
        p = [int(x) for x in rng.integers(1, CFG.vocab_size, 33)]
        eng.submit(p, max_new_tokens=3)
    done = eng.run()
    assert len(done) == 4
    assert all(len(r.output_ids) == 3 for r in done.values())


def test_paged_engine_recover_exact_continuation():
    """recover(): in-flight requests requeue with prompt+outputs, the
    pool resets; the re-admitted greedy continuation reproduces the
    uninterrupted stream exactly."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8]]
    lens = [8, 7]

    def fresh():
        eng = PagedEngine(params, CFG, num_pages=24, page_size=PSZ,
                          slots=2, max_seq=64, prefill_buckets=(8,))
        uids = [eng.submit(p, max_new_tokens=n)
                for p, n in zip(prompts, lens)]
        return eng, uids

    eng, uids = fresh()
    ref = {u: r.output_ids for u, r in eng.run().items()}

    eng, uids = fresh()
    for _ in range(3):          # partial progress
        eng.step()
    n = eng.recover()
    assert n == 2
    assert eng.alloc.available == 23    # every page released
    done = eng.run()
    for u in uids:
        assert done[u].output_ids == ref[u], u


def test_watchdog_over_paged_engines():
    """The multi-engine watchdog drives PagedEngines too (duck-typed
    step/recover/queue interface): requests on a dying paged engine
    re-dispatch to the healthy one and finish with the same streams."""
    from quantizations_tpu.serve.paged import PagedEngine
    from quantizations_tpu.serve.watchdog import Watchdog

    params = init_llama_params(CFG, seed=0)

    class FailingPagedEngine(PagedEngine):
        _nsteps = 0

        def step(self):
            if self._nsteps >= 3:
                raise RuntimeError("injected device failure")
            self._nsteps += 1
            return super().step()

    def mk(cls):
        return cls(params, CFG, num_pages=24, page_size=PSZ, slots=2,
                   max_seq=64, prefill_buckets=(8,))

    prompts = [[3, 1, 4], [2, 7, 1, 8], [9, 9, 5], [5, 5, 5, 5]]
    lens = [6, 6, 5, 5]

    ref_eng = mk(PagedEngine)
    ref_uid = [ref_eng.submit(p, max_new_tokens=n)
               for p, n in zip(prompts, lens)]
    ref = ref_eng.run()

    bad = mk(FailingPagedEngine)
    good = mk(PagedEngine)
    for p, n in zip(prompts, lens):
        bad.submit(p, max_new_tokens=n)
    wd = Watchdog([bad, good])
    done = wd.run()
    assert wd.dead == [True, False]
    assert wd.failures == [0]
    assert len(done) == len(prompts)
    for p, u in zip(prompts, ref_uid):
        r = next(r for r in done if r.prompt_ids[:len(p)] == p)
        assert r.done
        assert r.output_ids == ref[u].output_ids, p


def test_paged_engine_step_window_matches_plain():
    """run(steps_per_dispatch=n) streams token-identically to the plain
    paged engine — mid-window finishes (mixed lengths), a fresh request
    admitted at a window boundary after retirement (page reuse), and
    the near-max_seq fallback to plain steps all covered."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9, 1, 2, 3]]
    lens = [5, 9, 4]

    def mk():
        return PagedEngine(params, CFG, num_pages=24, page_size=PSZ,
                           slots=2, max_seq=32, prefill_buckets=(8,))

    eng = mk()
    uids = [eng.submit(p, max_new_tokens=n)
            for p, n in zip(prompts, lens)]
    ref = eng.run()

    eng = mk()
    uids2 = [eng.submit(p, max_new_tokens=n)
             for p, n in zip(prompts, lens)]
    done = eng.run(steps_per_dispatch=4)
    for u, ru in zip(uids2, uids):
        assert done[u].output_ids == ref[ru].output_ids, u
    assert eng.alloc.available == 23
    st = eng.stats()
    assert st["finished"] == 3 and st["active_slots"] == 0
    assert st["emitted_tokens"] == sum(lens)
    assert st["steps"] > 0 and st["steps"] % 4 == 0
    assert st["pages_free"] == 23 and st["pages_total"] == 24

    # a prompt long enough that pos + n crosses max_seq - 1 exercises
    # the plain-step fallback; stream must still match
    eng = mk()
    long_p = list(range(1, 26))
    u_ref = eng.submit(long_p, max_new_tokens=6)
    ref = eng.run()
    eng = mk()
    u = eng.submit(long_p, max_new_tokens=6)
    done = eng.run(steps_per_dispatch=4)
    assert done[u].output_ids == ref[u_ref].output_ids


def test_paged_engine_tp_matches_single_device():
    """PagedEngine over a tp mesh (kv-head-sharded pool, shard_map
    steps with the Megatron psum/all-gather pattern) streams
    token-identically to the single-device paged engine through the
    plain, multi-step, and speculative paths (batched admission runs
    in all of them)."""
    from quantizations_tpu.parallel import make_mesh, shard_llama_params
    from quantizations_tpu.parallel.shard import validate_tp
    from quantizations_tpu.serve.paged import PagedEngine

    tp = 2
    if len(jax.devices()) < tp:
        pytest.skip("needs 2 devices")
    validate_tp(CFG, tp)
    mesh = make_mesh((tp,), ("tp",))
    params = init_llama_params(CFG, seed=0)
    sharded = shard_llama_params(params, mesh, CFG)

    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9, 1, 2, 3]]
    lens = [5, 7, 4]

    def run(p, mesh_, spd=1, spec_k=0):
        eng = PagedEngine(p, CFG, num_pages=24, page_size=PSZ,
                          slots=2, max_seq=64, prefill_buckets=(8,),
                          mesh=mesh_)
        uids = [eng.submit(pr, max_new_tokens=n)
                for pr, n in zip(prompts, lens)]
        done = eng.run(spec_k=spec_k, steps_per_dispatch=spd)
        assert eng.alloc.available == 23
        return [done[u].output_ids for u in uids]

    ref = run(params, None)
    assert run(sharded, mesh) == ref
    assert run(sharded, mesh, spd=3) == ref
    assert run(sharded, mesh, spec_k=4) == ref


def test_paged_engine_matches_slot_engine():
    """PagedEngine produces the same greedy streams as the slot Engine,
    and frees its pages when requests finish."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.serve.engine import Engine
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9, 1, 2, 3]]
    lens = [5, 7, 4]

    ref_eng = Engine(params, CFG, ServeConfig(max_seq_len=64), slots=2,
                     prefill_buckets=(8,))
    ref_uids = [ref_eng.submit(p, max_new_tokens=n)
                for p, n in zip(prompts, lens)]
    ref = ref_eng.run()

    eng = PagedEngine(params, CFG, num_pages=24, page_size=PSZ,
                      slots=2, max_seq=64, prefill_buckets=(8,))
    uids = [eng.submit(p, max_new_tokens=n)
            for p, n in zip(prompts, lens)]
    done = eng.run()
    for u, ru in zip(uids, ref_uids):
        assert done[u].output_ids == ref[ru].output_ids, u
    # all pages returned to the allocator
    assert eng.alloc.available == 23


def test_paged_near_end_admission_shifted_chunk():
    """A prompt whose final padded prefill chunk would overrun max_seq
    streams identically to a no-shift reference (the shifted window
    re-feeds the overlap; a clamped write would scatter KV to wrong
    pages)."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.serve.engine import Engine
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    rng = np.random.default_rng(11)
    prompt = [int(t) for t in rng.integers(1, CFG.vocab_size, 44)]
    n = 3

    ref_eng = Engine(params, CFG, ServeConfig(max_seq_len=48),
                     slots=1, prefill_buckets=(8,))   # never shifts
    ru = ref_eng.submit(prompt, max_new_tokens=n)
    ref = ref_eng.run()[ru].output_ids

    eng = PagedEngine(params, CFG, num_pages=8, page_size=PSZ,
                      slots=1, max_seq=48, prefill_buckets=(8, 32))
    uid = eng.submit(prompt, max_new_tokens=n)
    assert eng.run()[uid].output_ids == ref


def test_paged_pool_oom_rolls_back_and_retries():
    """When the page pool runs dry mid-admission the failed request is
    rolled back (pages released, table row cleared) and re-queued; it
    admits after a live sequence retires, with streams identical to a
    roomy pool."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    rng = np.random.default_rng(5)
    p1 = [int(t) for t in rng.integers(1, CFG.vocab_size, 20)]
    p2 = [int(t) for t in rng.integers(1, CFG.vocab_size, 20)]
    n = 6

    roomy = PagedEngine(params, CFG, num_pages=16, page_size=PSZ,
                        slots=2, max_seq=32, prefill_buckets=(8,))
    r1 = roomy.submit(p1, max_new_tokens=n)
    r2 = roomy.submit(p2, max_new_tokens=n)
    ref = roomy.run()

    # pages 1..2 usable: exactly ONE 2-page sequence fits at a time
    tight = PagedEngine(params, CFG, num_pages=3, page_size=PSZ,
                        slots=2, max_seq=32, prefill_buckets=(8,),
                        admit_width=2)
    u1 = tight.submit(p1, max_new_tokens=n)
    u2 = tight.submit(p2, max_new_tokens=n)
    done = tight.run()
    assert done[u1].output_ids == ref[r1].output_ids
    assert done[u2].output_ids == ref[r2].output_ids
    assert tight.alloc.available == 2          # no leaked pages
    assert not any(tight.owned[s] for s in range(2))


def test_paged_impossible_request_rejected_at_submit():
    """A request that can never complete (needs more pages than the
    pool has) is rejected at submit — admitted, it would head-of-line
    block the queue forever via the OOM rollback."""
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(CFG, seed=0)
    eng = PagedEngine(params, CFG, num_pages=2, page_size=PSZ,
                      slots=1, max_seq=32, prefill_buckets=(8,))
    with pytest.raises(ValueError, match="usable pages"):
        eng.submit(list(range(1, 21)), max_new_tokens=4)  # 2 pages > 1
    # a fitting request on the same engine still serves
    uid = eng.submit([3, 1, 4, 1, 5], max_new_tokens=3)   # 1 page
    done = eng.run()
    assert len(done[uid].output_ids) == 3
    assert eng.alloc.available == 1


def test_slot_submit_rejects_oversized_prompt():
    """Engine.submit validates prompt length so a bad request can never
    strand co-admitted requests mid-_admit."""
    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.serve.engine import Engine

    params = init_llama_params(CFG, seed=0)
    eng = Engine(params, CFG, ServeConfig(max_seq_len=32), slots=2,
                 prefill_buckets=(8,))
    with pytest.raises(ValueError, match="max_seq"):
        eng.submit(list(range(1, 34)), max_new_tokens=2)
    uid = eng.submit([3, 1, 4], max_new_tokens=3)
    assert len(eng.run()[uid].output_ids) == 3


@pytest.mark.parametrize("knobs", [
    # Mistral: every layer slides; window < live context when verifying
    dict(sliding_window=6),
    # Gemma-2: alternating window + softcaps + query scale — the
    # traced-window q_span interaction differs per layer
    dict(sliding_window=6, sliding_layers="even", post_norms=True,
         norm_plus_one=True, hidden_activation="gelu_tanh",
         embed_normalizer=True, attn_logit_softcap=50.0,
         final_logit_softcap=30.0, query_scale=24),
])
def test_paged_engine_spec_matches_plain_windowed(knobs):
    """run(spec_k): token-identical to the plain paged engine on
    SLIDING-WINDOW configs — pins the q_span x window mask term
    (row t*G+g attends span <= len-1+t AND span > len-1+t-win) in the
    stacked verify kernels, which no q_span=1 test exercises."""
    from quantizations_tpu.serve.paged import PagedEngine

    cfg = dataclasses.replace(TINY_LLAMA, **knobs)
    params = init_llama_params(cfg, seed=0)
    # repetitive prompts -> real draft acceptances; lengths push the
    # live context well past the 6-token window during verification
    prompts = [[3, 1, 4, 3, 1, 4, 3, 1], [2, 7, 2, 7, 2, 7, 2, 7],
               [9, 9, 1, 2, 3, 9, 9, 1]]
    lens = [10, 9, 8]

    def run(spec_k):
        eng = PagedEngine(params, cfg, num_pages=24, page_size=PSZ,
                          slots=2, max_seq=64, prefill_buckets=(8,))
        uids = [eng.submit(p, max_new_tokens=n)
                for p, n in zip(prompts, lens)]
        done = eng.run(spec_k=spec_k)
        return [done[u].output_ids for u in uids]

    ref = run(0)
    got = run(4)
    assert got == ref, (got, ref)


def test_paged_oom_rollback_with_prefix_cache():
    """Pool exhaustion while admitting a request that already RETAINED
    shared prefix pages rolls the retains back (refcounts exact, the
    cache pin survives) and the request later admits through the
    prefix cache with a token-identical stream."""
    from quantizations_tpu.serve.paged import PagedEngine

    rng = np.random.default_rng(3)
    pa = [int(t) for t in rng.integers(1, CFG.vocab_size, 20)]
    pb = pa[:16] + [int(t) for t in rng.integers(1, CFG.vocab_size, 17)]
    params = init_llama_params(CFG, seed=0)

    roomy = PagedEngine(params, CFG, num_pages=16, page_size=PSZ,
                        slots=2, max_seq=48, prefill_buckets=(8,))
    ra = roomy.submit(pa, max_new_tokens=6)
    rb = roomy.submit(pb, max_new_tokens=4)
    ref = roomy.run()

    # usable pages 1..3: A takes 2 (one also pinned by the prefix
    # cache); B needs 1 shared + 2 fresh with only 1 free -> OOM
    eng = PagedEngine(params, CFG, num_pages=4, page_size=PSZ,
                      slots=2, max_seq=48, prefill_buckets=(8,),
                      prefix_cache=True)
    ua = eng.submit(pa, max_new_tokens=6)
    eng.step()                       # admits A only
    shared_pg = int(eng.table[0, 0])
    assert eng.alloc.refs(shared_pg) == 2     # A + cache pin
    ub = eng.submit(pb, max_new_tokens=4)
    eng.step()                       # B's admission OOMs, rolls back
    assert eng.active[1] is None and len(eng.queue) == 1
    assert eng.alloc.refs(shared_pg) == 2     # retain unwound
    done = eng.run()                 # A retires, B admits via prefix
    assert done[ua].output_ids == ref[ra].output_ids
    assert done[ub].output_ids == ref[rb].output_ids


@pytest.mark.parametrize("int8", [False, True])
def test_paged_attention_pages_per_step_identical(int8):
    """pages_per_step > 1 runs the SAME online-softmax recurrence over
    the same logical page order (each page its own block-table DMA,
    several issued per grid step) — outputs must be bitwise identical
    to the one-page-per-step kernel, for plain decode, stacked verify
    windows (q_span) and sliding windows."""
    from quantizations_tpu.ops.paged_attention import (
        paged_flash_decode_attention, paged_flash_decode_attention_i8)

    rng = np.random.default_rng(0)
    L, P, KVH, page, D = 2, 7, 2, 16, 32
    B, G = 2, 2
    tbl = jnp.asarray(rng.integers(1, P, (B, 4)), jnp.int32)
    lengths = jnp.asarray([2 * page + 3, page + 5], jnp.int32)
    li = jnp.int32(1)
    if int8:
        pk = jnp.asarray(rng.integers(-127, 128, (L, P, KVH, page, D)),
                         jnp.int8)
        pv = jnp.asarray(rng.integers(-127, 128, (L, P, KVH, page, D)),
                         jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.1, (L, P, KVH, page)),
                         jnp.bfloat16)
        vs = jnp.asarray(rng.uniform(0.01, 0.1, (L, P, KVH, page)),
                         jnp.bfloat16)
        def run(q, q_span, window, pps):
            return paged_flash_decode_attention_i8(
                q, pk, pv, ks, vs, tbl, li, lengths, interpret=True,
                q_span=q_span, window=window, pages_per_step=pps)
    else:
        pk = jnp.asarray(rng.standard_normal((L, P, KVH, page, D)),
                         jnp.bfloat16)
        pv = jnp.asarray(rng.standard_normal((L, P, KVH, page, D)),
                         jnp.bfloat16)
        def run(q, q_span, window, pps):
            return paged_flash_decode_attention(
                q, pk, pv, tbl, li, lengths, interpret=True,
                q_span=q_span, window=window, pages_per_step=pps)

    for q_span, window in ((1, None), (2, None), (1, jnp.int32(7))):
        q = jnp.asarray(rng.standard_normal((B, KVH, q_span * G, D)),
                        jnp.bfloat16)
        ref = np.asarray(run(q, q_span, window, 1))
        assert np.isfinite(ref).all()
        for pps in (2, 4):
            got = np.asarray(run(q, q_span, window, pps))
            assert np.array_equal(got, ref), (q_span, window, pps)
        # non-dividing request clamps (width 4, pps 3 -> 1)
        got = np.asarray(run(q, q_span, window, 3))
        assert np.array_equal(got, ref)


def test_paged_decode_pages_per_step_matches_slot_cache():
    """End-to-end: cfg.paged_pages_per_step=2 reproduces the slot-cache
    greedy stream through the paged forward."""
    cfg = dataclasses.replace(CFG, paged_pages_per_step=2)
    params = init_llama_params(cfg, seed=0)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    P = len(prompt)
    N = 6
    ids = jnp.asarray([prompt], jnp.int32)

    cache = KVCache.create(cfg, 1, 64)
    logits, cache = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg, last_token_only=True)
    )(params, ids, cache)
    ref = [int(jnp.argmax(logits[0, -1]))]
    step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, cfg))
    for i in range(N - 1):
        lg, cache = step(params, jnp.asarray([[ref[-1]]], jnp.int32),
                         cache, jnp.asarray([P + i], jnp.int32))
        ref.append(int(jnp.argmax(lg[0])))

    pages = PagedKVCache.create(cfg, num_pages=8, page_size=PSZ)
    alloc = PageAllocator(8)
    scratch = KVCache.create(cfg, 1, 64)
    logits, scratch = jax.jit(
        lambda p, i, c: prefill(p, i, c, cfg, last_token_only=True)
    )(params, ids, scratch)
    got = [int(jnp.argmax(logits[0, -1]))]
    need = -(-(P + N) // PSZ)
    page_ids = alloc.alloc(need)
    pages = insert_prefill(pages, scratch, page_ids, P)
    table = np.zeros((1, 4), np.int32)
    table[0, :need] = page_ids
    tbl = jnp.asarray(table)
    for i in range(N - 1):
        lg, pages = paged_decode_step(
            params, jnp.asarray([[got[-1]]], jnp.int32), pages, tbl,
            jnp.asarray([P + i], jnp.int32), cfg, max_pages=2)
        got.append(int(jnp.argmax(lg[0])))

    assert got == ref, (got, ref)


def test_default_page_size_auto_pick(quant_params_tiny=None):
    """page_size=None auto-picks the largest page <= 256 dividing
    max_seq (256 erases the paged-DMA tax on v5e, paged_sweep r3)."""
    from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params
    from quantizations_tpu.serve.paged import PagedEngine

    params = init_llama_params(TINY_LLAMA, seed=0)
    eng = PagedEngine(params, TINY_LLAMA, num_pages=8, max_seq=512)
    assert eng.page_size == 256
    eng = PagedEngine(params, TINY_LLAMA, num_pages=8, max_seq=192)
    assert eng.page_size == 64
