"""Profiling + observability (SURVEY.md §5).

The reference's only observability is external nsys/NCU runs with NVTX
ranges patched into its HF fork (reference core.py:6-9, images/*.png).
Here tracing is first-class: ``trace()`` wraps ``jax.profiler`` (view in
Perfetto/XProf/TensorBoard), the model annotates layers with
``jax.named_scope`` (the NVTX-range equivalent), and ``StepMetrics``
reports the numbers the reference prints by hand (TPS) plus achieved-
bandwidth and memory figures.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
from typing import Iterator, Optional

import jax

__all__ = ["trace", "StepMetrics", "device_memory_gb", "achieved_bandwidth"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/quantizations_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block.

    View with ``tensorboard --logdir <dir>`` or upload the
    ``.perfetto-trace`` file in ``plugins/profile`` to ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_gb(device=None) -> Optional[float]:
    """Live HBM use in GB, when the backend exposes memory_stats (the
    tunneled axon backend does not — returns None there)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return stats.get("bytes_in_use", 0) / 2**30


def achieved_bandwidth(bytes_touched: int, seconds: float) -> float:
    """GB/s."""
    return bytes_touched / seconds / 1e9


@dataclasses.dataclass
class StepMetrics:
    """Per-step serving metrics, JSON-printable (SURVEY.md §5 metrics)."""

    tokens: int = 0
    step_s: float = 0.0
    weight_bytes: int = 0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.step_s if self.step_s else 0.0

    @property
    def hbm_gbps(self) -> Optional[float]:
        if not (self.weight_bytes and self.step_s):
            return None
        return achieved_bandwidth(self.weight_bytes, self.step_s)

    def to_json(self) -> str:
        d = {
            "tokens": self.tokens,
            "step_s": round(self.step_s, 6),
            "tokens_per_s": round(self.tokens_per_s, 2),
        }
        bw = self.hbm_gbps
        if bw is not None:
            d["achieved_hbm_gbps"] = round(bw, 1)
        mem = device_memory_gb()
        if mem is not None:
            d["hbm_in_use_gb"] = round(mem, 3)
        return json.dumps(d)


def model_weight_bytes(params) -> int:
    """Total bytes streamed per decode token (all weight leaves)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
