"""int8 KV cache × tensor parallelism (VERDICT r2 #5).

The int8 cache's per-token dequant-step planes carry the kv-head axis,
so they shard exactly like the code planes (``cache_pspec(cfg)`` /
``paged_pool_pspec(cfg)``). Quantize-on-write is per-token-per-head
absmax — shard-local — so TP streams must be token-IDENTICAL to the
single-device int8 engine.
"""

import dataclasses

import jax
import pytest

from quantizations_tpu.config import ServeConfig
from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params
from quantizations_tpu.parallel import make_mesh, shard_llama_params
from quantizations_tpu.serve.engine import Engine
from quantizations_tpu.serve.paged import PagedEngine

CFG8 = dataclasses.replace(TINY_LLAMA, kv_cache_dtype="int8")
MAX_SEQ = 64
PROMPTS = [[3, 1, 4], [2, 7, 1, 8, 2, 8], [9, 9]]
LENS = [5, 6, 4]


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG8, seed=0)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    return make_mesh((2,), ("tp",))


def test_tp_engine_int8_matches_single_device(params, mesh):
    serve = ServeConfig(max_seq_len=MAX_SEQ)
    ref = Engine(params, CFG8, serve, slots=2, prefill_buckets=(8,))
    ref_uids = [ref.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    ref_done = ref.run()

    sharded = shard_llama_params(params, mesh, CFG8)
    eng = Engine(sharded, CFG8, serve, slots=2, prefill_buckets=(8,),
                 mesh=mesh)
    uids = [eng.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    done = eng.run()
    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref_done[ru].output_ids


def test_tp_paged_engine_int8_matches_single_device(params, mesh):
    kw = dict(num_pages=17, page_size=16, slots=2, max_seq=MAX_SEQ,
              prefill_buckets=(16,))
    ref = PagedEngine(params, CFG8, **kw)
    ref_uids = [ref.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    ref_done = ref.run()

    sharded = shard_llama_params(params, mesh, CFG8)
    eng = PagedEngine(sharded, CFG8, mesh=mesh, **kw)
    assert eng.pages.k_scale is not None
    uids = [eng.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    done = eng.run()
    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref_done[ru].output_ids


def test_tp_paged_engine_int8_multi_step(params, mesh):
    kw = dict(num_pages=17, page_size=16, slots=2, max_seq=MAX_SEQ,
              prefill_buckets=(16,))
    ref = PagedEngine(params, CFG8, **kw)
    ref_uids = [ref.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    ref_done = ref.run()

    sharded = shard_llama_params(params, mesh, CFG8)
    eng = PagedEngine(sharded, CFG8, mesh=mesh, **kw)
    uids = [eng.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    done = eng.run(steps_per_dispatch=3)
    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref_done[ru].output_ids


def test_tp_paged_engine_int8_spec(params, mesh):
    """Greedy speculative windows over the TP int8 pool stream
    token-identically to the plain single-device paged engine."""
    kw = dict(num_pages=17, page_size=16, slots=2, max_seq=MAX_SEQ,
              prefill_buckets=(16,))
    ref = PagedEngine(params, CFG8, **kw)
    ref_uids = [ref.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    ref_done = ref.run()

    sharded = shard_llama_params(params, mesh, CFG8)
    eng = PagedEngine(sharded, CFG8, mesh=mesh, **kw)
    uids = [eng.submit(p, n) for p, n in zip(PROMPTS, LENS)]
    done = eng.run(spec_k=4)
    for ru, u in zip(ref_uids, uids):
        assert done[u].output_ids == ref_done[ru].output_ids


def test_tp_sharded_generate_int8(params, mesh):
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from quantizations_tpu.models.llama import KVCache
    from quantizations_tpu.parallel.shard import (cache_pspec,
                                                  make_sharded_generate_fn)
    from quantizations_tpu.serve.generate import make_generate_fn

    serve = ServeConfig(max_seq_len=MAX_SEQ, max_new_tokens=8,
                        temperature=0.0)
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    key = jax.random.PRNGKey(0)

    gen = make_generate_fn(CFG8, serve)
    toks_ref, _ = gen(params, ids, KVCache.create(CFG8, 1, MAX_SEQ), key)

    sharded = shard_llama_params(params, mesh, CFG8)
    sgen = make_sharded_generate_fn(CFG8, serve, mesh)
    cache = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        KVCache.create(CFG8, 1, MAX_SEQ), cache_pspec(CFG8))
    toks_tp, _ = sgen(sharded, ids, cache, key)
    np.testing.assert_array_equal(np.asarray(toks_ref),
                                  np.asarray(toks_tp))
