"""Speculative decoding inside the continuous-batching engine: greedy
streams must be token-identical to the plain engine (whatever the
drafts), with fewer device dispatches when drafts hit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache, TINY_LLAMA, init_llama_params)
from quantizations_tpu.serve.engine import Engine, draft_lookup_host

CFG = TINY_LLAMA
MAX_SEQ = 64


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, seed=0)


def test_draft_lookup_host_matches_device():
    from quantizations_tpu.serve.speculative import draft_prompt_lookup

    rng = np.random.default_rng(0)
    for n in (2, 5, 17, 40):
        hist = rng.integers(0, 7, n).tolist()   # small vocab => matches
        k = 4
        d_host = draft_lookup_host(hist, k)
        S = n + k + 2
        hrow = jnp.asarray([hist + [0] * (S - n)], jnp.int32)
        d_dev = np.asarray(draft_prompt_lookup(
            hrow, jnp.asarray([n], jnp.int32), k))[0].tolist()
        # device pads no-match/wrap cases differently (any draft is
        # sound); when a bigram match exists the proposals must agree
        # on the in-history span
        b2, b1 = hist[-2], hist[-1]
        has_match = any(hist[j] == b2 and hist[j + 1] == b1
                        for j in range(n - 2))
        if has_match:
            j = max(j for j in range(n - 2)
                    if hist[j] == b2 and hist[j + 1] == b1)
            span = min(k, n - (j + 2))
            assert d_host[:span] == d_dev[:span], (hist, d_host, d_dev)


def _run_plain(params, prompts, lens):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    uids = [eng.submit(p, max_new_tokens=n) for p, n in zip(prompts, lens)]
    done = eng.run()
    return [done[u].output_ids for u in uids]


def test_spec_engine_greedy_token_identical(params):
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2, 8, 1, 8], [9, 9, 3],
               [5, 5, 5, 5, 5, 5]]
    lens = [10, 12, 8, 14]
    ref = _run_plain(params, prompts, lens)

    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    uids = [eng.submit(p, max_new_tokens=n) for p, n in zip(prompts, lens)]
    done = eng.run(spec_k=4)
    got = [done[u].output_ids for u in uids]
    assert got == ref
    # speculation must have compressed dispatches below 1/token
    st = eng.stats()
    assert st["spec_windows"] < sum(lens)


def test_spec_engine_repetitive_prompt_accepts(params):
    """A strongly repetitive stream should accept multi-token windows:
    total verify windows well below the token count."""
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=1, prefill_buckets=(8,))
    uid = eng.submit([7, 7, 7, 7, 7, 7], max_new_tokens=20)
    done = eng.run(spec_k=6)
    assert done[uid].done and len(done[uid].output_ids) == 20
    # the plain engine would use 20 dispatches
    assert eng.stats()["spec_windows"] <= 15


def test_spec_engine_cache_end_matches_plain(params):
    """Requests that run into the cache end must still stream
    token-identically: step_spec falls back to plain steps when any
    slot is within k of max_seq."""
    small = 24
    serve = ServeConfig(max_seq_len=small)
    prompts = [[3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1]]
    lens = [40, 40]   # forces out-of-room retirement at max_seq-1

    eng_p = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    uids_p = [eng_p.submit(p, max_new_tokens=n)
              for p, n in zip(prompts, lens)]
    ref = [eng_p.run()[u].output_ids for u in uids_p]

    eng_s = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    uids_s = [eng_s.submit(p, max_new_tokens=n)
              for p, n in zip(prompts, lens)]
    done = eng_s.run(spec_k=4)
    got = [done[u].output_ids for u in uids_s]
    assert got == ref


def test_spec_engine_temperature_smoke(params):
    """Temperature>0 slots run the per-row exact sampling path and
    complete; greedy slot in the same batch stays deterministic."""
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    ref = _run_plain(params, [[3, 1, 4, 1, 5]], [8])[0]
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    u_greedy = eng.submit([3, 1, 4, 1, 5], max_new_tokens=8)
    u_temp = eng.submit([2, 7, 1, 8], max_new_tokens=8, temperature=0.9)
    done = eng.run(spec_k=4)
    assert done[u_greedy].output_ids == ref
    assert len(done[u_temp].output_ids) == 8


def test_custom_draft_fn_token_identical_and_accepts(params):
    """Engine.draft_fn is pluggable (replay/oracle drafters, custom
    draft models): an ADVERSARIAL drafter must not change the greedy
    stream (verify corrects every wrong draft), and an ORACLE drafter
    (replaying the plain stream) must hit near-full acceptance."""
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2, 8, 1, 8]]
    lens = [10, 12]
    ref = _run_plain(params, prompts, lens)

    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    eng.draft_fn = lambda hist, k: [0] * k          # always-wrong drafts
    uids = [eng.submit(p, max_new_tokens=n)
            for p, n in zip(prompts, lens)]
    done = eng.run(spec_k=4)
    assert [done[u].output_ids for u in uids] == ref
    assert eng.stats()["spec_accept_rate"] < 0.3

    recorded = [list(p) + r for p, r in zip(prompts, ref)]

    def oracle(hist, k):
        for s in recorded:
            if len(s) > len(hist) and s[:len(hist)] == hist:
                nxt = s[len(hist):len(hist) + k]
                return nxt + [0] * (k - len(nxt))
        return [0] * k

    eng2 = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    eng2.draft_fn = oracle
    uids = [eng2.submit(p, max_new_tokens=n)
            for p, n in zip(prompts, lens)]
    done = eng2.run(spec_k=4)
    assert [done[u].output_ids for u in uids] == ref
    assert eng2.stats()["spec_accept_rate"] > 0.6
