"""Accuracy evaluation: quantization-parity metrics and benchmark
harnesses (the reference's accuracy bar is IFEval score parity with the
bf16 model, reference README.md:28)."""

from .parity import logit_parity, perplexity

__all__ = ["logit_parity", "perplexity"]
