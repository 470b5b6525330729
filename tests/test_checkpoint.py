"""Orbax native checkpoint round-trip (models/checkpoint.py)."""

import dataclasses

import jax
import numpy as np
import pytest

from quantizations_tpu.models.checkpoint import load_orbax, save_orbax
from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params


def test_orbax_roundtrip(tmp_path):
    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    path = str(tmp_path / "ckpt")
    save_orbax(params, cfg, path)
    cfg2, params2 = load_orbax(path)
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.float32) if a.dtype.name == "bfloat16"
            else np.asarray(a),
            np.asarray(b, dtype=np.float32) if b.dtype.name == "bfloat16"
            else np.asarray(b))


def test_orbax_restore_onto_mesh(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from quantizations_tpu.parallel import make_mesh

    cfg = TINY_LLAMA
    params = init_llama_params(cfg, seed=0)
    path = str(tmp_path / "ckpt")
    save_orbax(params, cfg, path)
    mesh = make_mesh((2,), ("tp",))
    cfg2, params2 = load_orbax(path, mesh=mesh)
    shards = params2.layers.q.wp.addressable_shards
    assert len(shards) == 2
    assert shards[0].data.shape[1] == params.layers.q.wp.shape[1] // 2
