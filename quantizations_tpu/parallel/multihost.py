"""Multi-host runtime: jax.distributed bring-up + dp x tp meshes.

The reference has no distributed story at all (SURVEY.md §2.3). The
TPU-native design: tensor parallelism rides ICI inside a host's slice
(parallel/shard.py), data parallelism / replica serving rides DCN across
hosts, and each host runs its own continuous-batching Engine against the
globally-sharded step function — the per-step collectives themselves
synchronize the replicas, no extra control plane is needed for the
decode path.

Typical bring-up on a pod slice:

    from quantizations_tpu.parallel import multihost
    multihost.initialize()               # no-op on single host
    mesh = multihost.make_dp_tp_mesh(tp=8)
    params = shard_llama_params(load_hf_llama(..., mesh=mesh), mesh, cfg)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "make_dp_tp_mesh", "make_dp_tp_generate_fn",
           "is_multihost", "host_local_batch"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (DCN control plane).

    On TPU pods the arguments are auto-detected from the environment;
    single-process runs return immediately. Safe to call more than once.
    """
    if num_processes in (None, 1) and coordinator_address is None \
            and "COORDINATOR_ADDRESS" not in os.environ \
            and int(os.environ.get("JAX_NUM_PROCESSES", "1")) <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def make_dp_tp_mesh(tp: int, dp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh over all devices (local + remote).

    Layout rule: the tp axis must be the FAST (minor) axis so its
    collectives (the per-layer psum and the vocab all_gather) ride ICI
    within a host's slice; dp crosses hosts over DCN and is touched only
    by data dispatch, never by the per-token decode path.
    """
    devs = jax.devices()
    if dp is None:
        dp = len(devs) // tp
    if dp * tp != len(devs):
        raise ValueError(
            f"dp({dp}) x tp({tp}) != device count {len(devs)}")
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def host_local_batch(global_batch: int) -> int:
    """Per-host share of a global batch (data-parallel serving)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} % hosts {n} != 0")
    return global_batch // n


def make_dp_tp_generate_fn(cfg, serve, mesh: Mesh):
    """shard_map + jit the generate loop over a (dp, tp) mesh: the batch
    splits across dp replicas (each runs the full TP decode with its
    own cache shard; dp needs no per-token collectives — replicas stay
    in step because the program is one jitted SPMD computation), tp
    carries the per-layer psums over ICI as in the single-axis path.

    ``(params, prompt_ids, cache, key) -> (tokens, cache)`` with
    prompt/tokens batch-sharded over dp; params are TP-sharded and
    dp-replicated (shard.llama_param_pspecs says nothing about dp, which
    under a 2-axis mesh means replication on dp). Batch must divide dp.
    """
    from jax.sharding import PartitionSpec as P

    from ..serve.generate import _generate_impl
    from .shard import AXIS, cache_pspec, llama_param_pspecs, validate_tp

    validate_tp(cfg, mesh.shape[AXIS])
    pspecs = llama_param_pspecs(cfg)
    cs = cache_pspec(cfg)
    sc = (P(None, "dp", AXIS, None)
          if cs.k_scale is not None else None)
    cspec = type(cs)(k=P(None, "dp", AXIS, None, None),
                     v=P(None, "dp", AXIS, None, None),
                     k_scale=sc, v_scale=sc)

    def body(params, prompt_ids, cache, key):
        # decorrelate dp replicas: a replicated key (in_specs P(None))
        # would give every replica identical gumbel noise per LOCAL
        # batch row — identical prompts on different replicas would
        # sample identically at temperature > 0.
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return _generate_impl(
            params, prompt_ids, cache, key,
            cfg=cfg,
            max_new_tokens=serve.max_new_tokens,
            temperature=serve.temperature,
            top_k=serve.top_k,
            top_p=serve.top_p,
            eos_id=serve.eos_id,
            axis_name=AXIS,
        )
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspec, P(None)),
        out_specs=(P("dp", None), cspec),
        check_vma=False,
    )
    donate = (2,) if serve.donate_cache else ()
    return jax.jit(mapped, donate_argnums=donate)
