"""quantizations_tpu — TPU-native 4-bit weight-only LLM inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference GPU library kkbwilldo/quantizations: bitsandbytes-compatible
blockwise FP4/NF4 quantization with optional double quantization of the
scale statistics, a Linear4bit module, fused dequant+GEMV Pallas decode
kernels, a Llama3 generate path, and mesh-sharded multi-chip serving.
"""

__version__ = "0.1.0"

from .config import QuantConfig, ServeConfig
from .quant import (
    QuantState,
    dequantize_4bit,
    dequantize_blockwise,
    quantize_4bit,
    quantize_blockwise,
)

__all__ = [
    "QuantState",
    "QuantConfig",
    "ServeConfig",
    "quantize_4bit",
    "dequantize_4bit",
    "quantize_blockwise",
    "dequantize_blockwise",
    # Submodules (imported lazily to keep `import quantizations_tpu` light):
    # .nn (Linear4bit), .models (Llama), .serve (generate), .parallel (TP).
]
