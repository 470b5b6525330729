"""Native (orbax) checkpointing of quantized models.

Two checkpoint families exist (SURVEY.md §5 checkpoint/resume):

- ``hf_loader.save_quantized`` / ``load_quantized``: single-file
  safetensors with bnb-style keys — portable, host-memory-bound.
- This module: orbax — sharded, async-capable, resumable; the right
  choice for multi-host serving (each host writes/reads its own shards
  directly into its mesh placement).
"""

from __future__ import annotations

import dataclasses
import json
import os
import jax

from ..config import QuantConfig
from .llama import LlamaConfig, LlamaParams

__all__ = ["save_orbax", "load_orbax"]

_CFG_FILE = "llama_config.json"


def _cfg_to_json(cfg: LlamaConfig) -> str:
    d = dataclasses.asdict(cfg)
    d["quant"]["compute_dtype"] = str(
        jax.numpy.dtype(cfg.quant.compute_dtype).name)
    d["quant"]["scales_dtype"] = (
        "bf16x2" if cfg.quant.scales_dtype == "bf16x2"
        else str(jax.numpy.dtype(cfg.quant.scales_dtype).name))
    return json.dumps(d, indent=1)


def _cfg_from_json(s: str) -> LlamaConfig:
    d = json.loads(s)
    q = d.pop("quant")
    q["compute_dtype"] = jax.numpy.dtype(q["compute_dtype"])
    sd = q.get("scales_dtype", "float32")
    q["scales_dtype"] = sd if sd == "bf16x2" else jax.numpy.dtype(sd)
    rs = d.get("rope_scaling")
    if rs is not None:
        d["rope_scaling"] = tuple(rs)
    return LlamaConfig(quant=QuantConfig(**q), **d)


def save_orbax(params: LlamaParams, cfg: LlamaConfig, path: str) -> None:
    """Write params (sharded arrays are written per-shard) + config."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params)
    ckptr.wait_until_finished()
    with open(os.path.join(path, _CFG_FILE), "w") as f:
        f.write(_cfg_to_json(cfg))


def load_orbax(path: str, mesh=None):
    """Restore ``(cfg, params)``; with ``mesh``, arrays restore directly
    into their TP shardings (no full-model host round-trip)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _CFG_FILE)) as f:
        cfg = _cfg_from_json(f.read())

    from .llama import init_llama_params

    target = jax.eval_shape(lambda: init_llama_params(cfg, seed=0))
    if mesh is not None:
        from jax.sharding import NamedSharding

        from ..parallel.shard import llama_param_pspecs

        specs = llama_param_pspecs(cfg)
        target = jax.tree.map(
            lambda s, p: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
            target, specs)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"), target)
    return cfg, params
