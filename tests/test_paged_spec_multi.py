"""spec_k × steps_per_dispatch composition (VERDICT r2 #7):
``PagedEngine.run(spec_k=k, steps_per_dispatch=n)`` runs n speculative
verify windows per dispatch with ON-DEVICE drafting. Greedy streams
must be token-identical to the plain paged engine (speculative
decoding's correctness contract), regardless of draft quality."""

import jax
import pytest

from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params
from quantizations_tpu.serve.paged import PagedEngine

CFG = TINY_LLAMA
KW = dict(num_pages=33, page_size=16, slots=2, max_seq=256,
          prefill_buckets=(16,))
PROMPTS = [[3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1, 8], [9, 9, 3, 7, 5]]
LENS = [24, 17, 30]


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, seed=0)


@pytest.fixture(scope="module")
def ref_done(params):
    eng = PagedEngine(params, CFG, **KW)
    uids = [eng.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    return uids, eng.run()


@pytest.mark.parametrize("k,n", [(4, 2), (4, 3), (8, 2)])
def test_spec_multi_greedy_token_identical(params, ref_done, k, n):
    ref_uids, ref = ref_done
    eng = PagedEngine(params, CFG, **KW)
    uids = [eng.submit(p, ln) for p, ln in zip(PROMPTS, LENS)]
    done = eng.run(spec_k=k, steps_per_dispatch=n)
    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref[ru].output_ids
    # fewer dispatches than tokens: the windows actually composed
    assert eng.stats()["spec_windows"] > 0


def test_spec_multi_near_cache_end_falls_back(params):
    """Requests whose windows would cross max_seq - 1 must run to the
    boundary token-identically (multi → single-window → plain step
    fallback chain)."""
    kw = dict(KW, max_seq=32, num_pages=9)
    ref = PagedEngine(params, CFG, **kw)
    ru = ref.submit(PROMPTS[0], 20)
    ref_out = ref.run()[ru].output_ids

    eng = PagedEngine(params, CFG, **kw)
    u = eng.submit(PROMPTS[0], 20)
    out = eng.run(spec_k=4, steps_per_dispatch=3)[u].output_ids
    assert out == ref_out


def test_spec_multi_eos_mid_stream(params):
    """A row hitting eos inside a window stream stops exactly there."""
    ref = PagedEngine(params, CFG, **KW)
    ru = ref.submit(PROMPTS[0], 24)
    ref_out = ref.run()[ru].output_ids
    eos = ref_out[len(ref_out) // 2]
    want = ref_out[:ref_out.index(eos) + 1]

    eng = PagedEngine(params, CFG, **KW)
    u = eng.submit(PROMPTS[0], 24, eos_id=eos)
    out = eng.run(spec_k=4, steps_per_dispatch=3)[u].output_ids
    assert out == want


def test_spec_multi_tp_mesh(params):
    """The composed windows run under the TP paged pool too."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from quantizations_tpu.parallel import make_mesh, shard_llama_params

    ref = PagedEngine(params, CFG, **KW)
    ref_uids = [ref.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    ref_out = ref.run()

    mesh = make_mesh((2,), ("tp",))
    sharded = shard_llama_params(params, mesh, CFG)
    eng = PagedEngine(sharded, CFG, mesh=mesh, **KW)
    uids = [eng.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    done = eng.run(spec_k=4, steps_per_dispatch=2)
    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref_out[ru].output_ids
