"""Reliable device timing on asynchronously-dispatched backends.

Naive ``time() ... block_until_ready()`` loops are unreliable through
remote/tunneled runtimes (dispatch batching and caching make impossible
>SOL bandwidths appear). ``time_scan_chain`` times N *data-dependent*
iterations inside a single jitted ``lax.scan``: each step consumes a
scalar derived from the previous step's output (through an
``optimization_barrier``, so XLA cannot hoist or elide the body), and the
result is fetched to host. Per-iteration time = total / N, with the
one-time dispatch overhead amortized away.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["time_scan_chain"]


def time_scan_chain(
    fn: Callable[..., jnp.ndarray],
    x0: jnp.ndarray,
    iters: int = 100,
    trials: int = 3,
    min_total_s: float = 0.5,
    max_iters: int = 20000,
    consts: tuple = (),
) -> float:
    """Return best per-iteration seconds for ``fn`` called ``iters`` times
    with serialized data dependencies.

    ``fn`` maps an array x (plus ``consts``, passed through) to any
    array; each step perturbs x by an epsilon-scaled scalar of the
    output so the chain is sequential but numerically a no-op.

    Pass large loop-invariant arrays via ``consts``, NOT via closure:
    closed-over arrays are lifted into jaxpr constants and shipped in
    the remote-compile request body (an lm_head-sized weight overflows
    the tunnel's request limit with HTTP 413).

    The tunneled runtime has a ~40-50 ms host<->device round-trip per
    dispatch, so a chain whose total device time is below that measures
    ONLY the tunnel (and every sub-millisecond kernel looks identical).
    The iteration count is grown until the measured total exceeds
    ``min_total_s`` (default 0.5 s >> round-trip), then the per-iteration
    time is taken as the slope between two iteration counts, which
    cancels the fixed dispatch cost exactly.
    """

    def total_time(n: int) -> float:
        @jax.jit
        def chain(x, *cs):
            def body(x, _):
                o = fn(x, *cs)
                o = jax.lax.optimization_barrier(o)
                eps = jnp.sum(o.astype(jnp.float32)) * jnp.float32(1e-30)
                return x + eps.astype(x.dtype), ()

            xf, _ = jax.lax.scan(body, x, (), length=n)
            return jnp.sum(xf.astype(jnp.float32))

        float(chain(x0, *consts))  # compile + warm up
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(x0, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    t = total_time(iters)
    while t < min_total_s and iters < max_iters:
        iters *= 4
        t = total_time(iters)
    # slope between iters and iters/2 cancels fixed dispatch overhead
    t_half = total_time(max(1, iters // 2))
    return max((t - t_half) / (iters - iters // 2), 1e-12)
