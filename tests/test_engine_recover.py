"""Engine failure recovery: requeued in-flight requests must complete
with exactly the tokens an uninterrupted run produces (greedy)."""

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params
from quantizations_tpu.serve.engine import Engine

CFG = TINY_LLAMA
MAX_SEQ = 48


def test_recover_mid_generation_preserves_output():
    params = init_llama_params(CFG, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ)

    ref = Engine(params, CFG, serve, slots=1, prefill_buckets=(8, 16))
    u0 = ref.submit([3, 1, 4, 1], max_new_tokens=8)
    want = ref.run()[u0].output_ids

    eng = Engine(params, CFG, serve, slots=1, prefill_buckets=(8, 16))
    uid = eng.submit([3, 1, 4, 1], max_new_tokens=8)
    for _ in range(3):
        eng.step()
    assert eng.active[0] is not None and len(eng.active[0].output_ids) == 3
    n = eng.recover()          # simulate a device failure mid-flight
    assert n == 1
    done = eng.run()
    assert done[uid].output_ids == want
