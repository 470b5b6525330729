"""Serving layer: jitted generate loop, sampling, engines, metrics."""

from .engine import Engine, Request
from .generate import GenerateResult, generate, make_generate_fn, sample_logits
from .paged import PagedEngine, PagedKVCache
from .watchdog import Watchdog

__all__ = [
    "generate",
    "make_generate_fn",
    "sample_logits",
    "GenerateResult",
    "Engine",
    "Request",
    "PagedEngine",
    "PagedKVCache",
    "Watchdog",
]
