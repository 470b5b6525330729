"""Parity-harness tests: the quantized model must closely track its own
dequantized-dense twin (the measurable core of the reference's
"IFEval identical" accuracy bar, reference README.md:28)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizations_tpu.evals.parity import logit_parity, perplexity
from quantizations_tpu.models.llama import TINY_LLAMA, init_llama_params


@pytest.fixture(scope="module")
def params():
    return init_llama_params(TINY_LLAMA, seed=0)


def test_logit_parity_close(params):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, TINY_LLAMA.vocab_size, (2, 12)), jnp.int32)
    rep = logit_parity(params, TINY_LLAMA, ids)
    # weight-only 4-bit: the two paths share everything except the
    # packed-vs-dense weight representation, so agreement must be high
    assert rep.top1_agreement > 0.95, rep
    assert rep.mean_kl < 1e-4, rep
    assert abs(rep.ppl_quant - rep.ppl_dense) / rep.ppl_dense < 0.01, rep


def test_perplexity_finite(params):
    rng = np.random.default_rng(1)
    ids = jnp.asarray(
        rng.integers(0, TINY_LLAMA.vocab_size, (1, 16)), jnp.int32)
    ppl = perplexity(params, TINY_LLAMA, ids)
    assert np.isfinite(ppl) and ppl > 1.0


def test_lazy_dense_forward_bit_identical(params):
    """The lazy (in-jit per-layer dequant) dense twin produces logits
    bit-identical to the materialized twin — it is the same
    `_dense_from_qlinear` math, so the 8B OOM path (auto-selected above
    ~4 GB of dense-twin bytes) measures exactly the same parity."""
    import functools

    from quantizations_tpu.evals.parity import (
        _dense_forward, dequantized_params)

    rng = np.random.default_rng(2)
    ids = jnp.asarray(
        rng.integers(0, TINY_LLAMA.vocab_size, (1, 8)), jnp.int32)
    dense = dequantized_params(params, TINY_LLAMA)
    want = np.asarray(jax.jit(functools.partial(
        _dense_forward, cfg=TINY_LLAMA))(dense, ids))
    got = np.asarray(jax.jit(functools.partial(
        _dense_forward, cfg=TINY_LLAMA, lazy=True))(params, ids))
    np.testing.assert_array_equal(got, want)


def test_proxy_weight_slab_path(monkeypatch):
    """Vocab-sized proxy matrices sample in row slabs (the 8B-proxy
    init OOM fix): the slab path must produce the same shape/statistics
    class and be deterministic per key."""
    import quantizations_tpu.models.llama as M

    key = jax.random.PRNGKey(7)
    monkeypatch.setattr(M, "_PROXY_SLAB_ELEMS", 1)   # force slabs
    a = M._proxy_weight(key, 32, 64, 0.02)
    b = M._proxy_weight(key, 32, 64, 0.02)
    assert a.shape == (32, 64) and bool(jnp.all(a == b))
    assert bool(jnp.isfinite(a).all())
    # heavy tails + row spread survive the slabbing
    assert float(jnp.abs(a).max()) > 3 * float(jnp.abs(a).mean())
