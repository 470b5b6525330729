"""Parallelism: device mesh, tensor-parallel shardings, sharded generate.

The reference is strictly single-GPU (SURVEY.md §2.3). This package is
the new, TPU-first scale-out design: packed-int4 weight shards and the
KV cache laid out over a ``jax.sharding.Mesh``, ``shard_map``-ed forward
with XLA collectives (psum of row-parallel partials, all_gather of the
vocab-sharded logits) riding ICI.
"""

from . import multihost, pipeline, ring
from .mesh import make_mesh
from .shard import (
    cache_pspec,
    llama_param_pspecs,
    make_sharded_generate_fn,
    shard_llama_params,
)

__all__ = [
    "multihost",
    "pipeline",
    "ring",
    "make_mesh",
    "llama_param_pspecs",
    "cache_pspec",
    "shard_llama_params",
    "make_sharded_generate_fn",
]
