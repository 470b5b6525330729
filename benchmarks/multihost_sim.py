"""Multi-process validation of the dp x tp serving path (BASELINE
config 5): TWO OS processes bring up jax.distributed (Gloo over
loopback), form a (dp=2, tp=4) mesh over 8 CPU devices (4 per process),
shard the quantized model + KV cache, and run the jitted generate —
tokens must equal the single-device run.

    python benchmarks/multihost_sim.py            # launcher
    python benchmarks/multihost_sim.py --worker N # internal
"""

import os
import subprocess
import sys
from pathlib import Path

ROOT = str(Path(__file__).resolve().parents[1])
COORD = "127.0.0.1:29517"
NPROC = 2


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=COORD,
                               num_processes=NPROC, process_id=pid)
    sys.path.insert(0, ROOT)
    import numpy as np
    import jax.numpy as jnp

    from quantizations_tpu.config import ServeConfig
    from quantizations_tpu.models.llama import (
        KVCache, TINY_LLAMA, init_llama_params)
    from quantizations_tpu.parallel.multihost import (
        make_dp_tp_generate_fn, make_dp_tp_mesh)
    from quantizations_tpu.parallel.shard import shard_llama_params

    cfg = TINY_LLAMA
    serve = ServeConfig(max_seq_len=48, max_new_tokens=6, temperature=0.0)
    params = init_llama_params(cfg, seed=0)
    mesh = make_dp_tp_mesh(tp=4)            # dp=2: one replica/process
    sparams = shard_llama_params(params, mesh, cfg)
    gen = make_dp_tp_generate_fn(cfg, serve, mesh)
    ids = jnp.asarray([[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]], jnp.int32)
    toks, _ = gen(sparams, ids, KVCache.create(cfg, 2, 48),
                  jax.random.PRNGKey(0))
    out = np.asarray(
        jax.experimental.multihost_utils.process_allgather(
            toks, tiled=True))
    if pid == 0:
        from quantizations_tpu.serve.generate import make_generate_fn

        # single-device reference on this process's local view
        ref_gen = make_generate_fn(cfg, serve)
        ref, _ = ref_gen(params, ids, KVCache.create(cfg, 2, 48),
                         jax.random.PRNGKey(0))
        same = bool((out[:2] == np.asarray(ref)).all())
        print(f"dp x tp across 2 processes token-identical: {same}")
        print("tokens:", out[:2].tolist())


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(p)])
        for p in range(1, NPROC)]
    worker(0)
    for p in procs:
        p.wait()


if __name__ == "__main__":
    main()
