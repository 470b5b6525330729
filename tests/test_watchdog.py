"""Multi-engine failure watchdog: requests survive an engine death
(SURVEY.md §5 failure detection/recovery; CPU-sim with injected
failures)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import (
    KVCache, TINY_LLAMA, init_llama_params)
from quantizations_tpu.serve.engine import Engine
from quantizations_tpu.serve.generate import make_generate_fn
from quantizations_tpu.serve.watchdog import Watchdog

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


def _mk_engine(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    return Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))


class FailingEngine(Engine):
    """Engine whose step raises after ``fail_after`` successful steps."""

    fail_after = 3

    def step(self):
        if self._steps >= self.fail_after:
            raise RuntimeError("injected device failure")
        return super().step()


def test_requests_survive_engine_kill(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    bad = FailingEngine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    good = _mk_engine(params)
    prompts = [[3, 1, 4], [2, 7, 1, 8], [9, 9, 5], [5, 5, 5, 5]]
    lens = [6, 6, 5, 5]
    for p, n in zip(prompts, lens):
        bad.submit(p, max_new_tokens=n)

    wd = Watchdog([bad, good])
    done = wd.run()

    assert wd.dead == [True, False]
    assert wd.failures == [0]
    assert len(done) == len(prompts)
    # every request finished with the exact greedy stream — including
    # the in-flight ones whose generation resumed on the healthy engine
    for p, n in zip(prompts, lens):
        r = next(r for r in done
                 if r.prompt_ids[:len(p)] == p or r.prompt_ids == p)
        assert r.done
        assert r.output_ids == _reference_tokens(params, p, n), p


def test_all_engines_dead_raises(params):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    bad = FailingEngine(params, CFG, serve, slots=1, prefill_buckets=(8,))
    bad.fail_after = 0
    bad.submit([1, 2, 3], max_new_tokens=4)
    wd = Watchdog([bad])
    with pytest.raises(RuntimeError, match="no live engine"):
        wd.run()


def test_hung_step_detected_by_timeout(params):
    """A step that never returns trips the wall-clock deadline and the
    request is re-dispatched."""
    import threading

    serve = ServeConfig(max_seq_len=MAX_SEQ)

    class HangingEngine(Engine):
        hang = True

        def step(self):
            if self._steps >= 1 and self.hang:
                threading.Event().wait(30)   # never set: simulated hang
                return 0                     # abandoned thread: no-op
            return super().step()

    bad = HangingEngine(params, CFG, serve, slots=1, prefill_buckets=(8,))
    good = _mk_engine(params)
    # warm the healthy engine's jitted step/prefill: a cold compile on
    # this 1-core box can exceed any reasonable step deadline and would
    # falsely trip the watchdog
    good.submit([1, 2], max_new_tokens=2)
    good.run()
    prompt = [3, 1, 4]
    bad.submit(prompt, max_new_tokens=5)
    wd = Watchdog([bad, good], step_timeout_s=10.0)
    done = wd.run()
    assert wd.dead[0] and not wd.dead[1]
    r = next(r for r in done if r.prompt_ids[:3] == prompt)
    assert r.done
    assert r.output_ids == _reference_tokens(params, prompt, 5)


def test_mixed_slot_and_paged_pool(params):
    """A watchdog pool may MIX engine kinds (re-dispatch moves only
    Request objects): a dying slot engine's requests finish on a
    healthy PagedEngine with the exact greedy streams."""
    from quantizations_tpu.serve.paged import PagedEngine

    serve = ServeConfig(max_seq_len=MAX_SEQ)
    bad = FailingEngine(params, CFG, serve, slots=2,
                        prefill_buckets=(8,))
    good = PagedEngine(params, CFG, num_pages=16, page_size=16,
                       slots=2, max_seq=MAX_SEQ, prefill_buckets=(8,))
    prompts = [[3, 1, 4], [2, 7, 1, 8], [9, 9, 5]]
    lens = [6, 6, 5]
    for p, n in zip(prompts, lens):
        bad.submit(p, max_new_tokens=n)
    wd = Watchdog([bad, good])
    done = wd.run()
    assert wd.dead == [True, False]
    assert len(done) == len(prompts)
    for p, n in zip(prompts, lens):
        r = next(r for r in done if r.prompt_ids[:len(p)] == p)
        assert r.done
        assert r.output_ids == _reference_tokens(params, p, n), p


def test_no_failure_passthrough(params):
    """With healthy engines the watchdog is a plain driver: results
    match Engine.run()."""
    e1, e2 = _mk_engine(params), _mk_engine(params)
    p1, p2 = [3, 1, 4], [2, 7, 1]
    e1.submit(p1, max_new_tokens=5)
    e2.submit(p2, max_new_tokens=5)
    wd = Watchdog([e1, e2])
    done = wd.run()
    assert len(done) == 2 and not any(wd.dead)
    for r in done:
        ref = _reference_tokens(params, r.prompt_ids, 5)
        assert r.output_ids == ref
