"""Continuous-batching engine tests (BASELINE config 5, single host).

The engine must produce, for each request, exactly the tokens the plain
batch-1 generate loop produces — while serving several interleaved
requests at different sequence positions from one batched cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache,
    TINY_LLAMA,
    init_llama_params,
)
from quantizations_tpu.serve.engine import Engine
from quantizations_tpu.serve.generate import make_generate_fn

CFG = TINY_LLAMA
MAX_SEQ = 48


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, seed=0)


def _reference_tokens(params, prompt, n):
    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=n,
                        temperature=0.0, donate_cache=False)
    gen = make_generate_fn(CFG, serve)
    ids = jnp.asarray([prompt], jnp.int32)
    toks, _ = gen(params, ids, KVCache.create(CFG, 1, MAX_SEQ),
                  jax.random.PRNGKey(0))
    return list(np.asarray(toks)[0])


def test_single_request_matches_generate(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8, 16))
    prompt = [3, 1, 4, 1, 5]
    uid = eng.submit(prompt, max_new_tokens=6)
    done = eng.run()
    assert done[uid].done
    assert done[uid].output_ids == _reference_tokens(params, prompt, 6)


def test_interleaved_requests_match_isolated(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9], [5, 5, 5, 5]]
    lens = [5, 7, 4, 6]
    uids = [eng.submit(p, max_new_tokens=n) for p, n in zip(prompts, lens)]
    done = eng.run()
    assert len(done) == 4
    for uid, p, n in zip(uids, prompts, lens):
        assert done[uid].output_ids == _reference_tokens(params, p, n), uid


def test_eos_stops_early(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=1, prefill_buckets=(8,))
    prompt = [3, 1, 4]
    ref = _reference_tokens(params, prompt, 8)
    eos = ref[3]  # force stop at the 4th generated token
    uid = eng.submit(prompt, max_new_tokens=8, eos_id=eos)
    done = eng.run()
    assert done[uid].output_ids == ref[:4]


def test_per_request_temperature_and_streaming(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    eng = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,),
                 temperature=0.0, seed=3)
    streamed = []
    eng.on_token = lambda req, tok: streamed.append((req.uid, tok))
    u_greedy = eng.submit([3, 1, 4], max_new_tokens=5)       # default: greedy
    u_hot = eng.submit([3, 1, 4], max_new_tokens=5, temperature=1.5)
    done = eng.run()
    ref = _reference_tokens(params, [3, 1, 4], 5)
    assert done[u_greedy].output_ids == ref
    assert all(0 <= t < CFG.vocab_size for t in done[u_hot].output_ids)
    # streaming saw every token of both requests
    assert sorted(t for u, t in streamed if u == u_greedy) == sorted(ref)
    assert len([1 for u, _ in streamed if u == u_hot]) == 5
