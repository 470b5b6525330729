"""Continuous batching over a TP mesh (BASELINE config 5): the sharded
engine must produce the same tokens as the single-device engine."""

import jax
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params
from quantizations_tpu.parallel import make_mesh, shard_llama_params
from quantizations_tpu.serve.engine import Engine

CFG = TINY_LLAMA
MAX_SEQ = 48


def test_tp_engine_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    params = init_llama_params(CFG, seed=0)
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    prompts = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9]]
    lens = [5, 6, 4]

    ref = Engine(params, CFG, serve, slots=2, prefill_buckets=(8,))
    ref_uids = [ref.submit(p, n) for p, n in zip(prompts, lens)]
    ref_done = ref.run()

    mesh = make_mesh((4,), ("tp",))
    sharded = shard_llama_params(params, mesh, CFG)
    eng = Engine(sharded, CFG, serve, slots=2, prefill_buckets=(8,),
                 mesh=mesh)
    uids = [eng.submit(p, n) for p, n in zip(prompts, lens)]
    done = eng.run()

    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref_done[ru].output_ids
