"""Serving layer: jitted generate loop, sampling, metrics."""

from .engine import Engine, Request
from .generate import GenerateResult, generate, make_generate_fn, sample_logits

__all__ = [
    "generate",
    "make_generate_fn",
    "sample_logits",
    "GenerateResult",
    "Engine",
    "Request",
]
