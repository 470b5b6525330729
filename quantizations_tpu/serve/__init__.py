"""Serving layer: jitted generate loop, sampling, metrics."""

from .generate import GenerateResult, generate, make_generate_fn, sample_logits

__all__ = ["generate", "make_generate_fn", "sample_logits", "GenerateResult"]
