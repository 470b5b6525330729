from .linear import (
    GEMV_MAX_TOKENS,
    Linear4bit,
    Params4bit,
    dequantize_permuted,
    permute_cols,
)

__all__ = [
    "Linear4bit",
    "Params4bit",
    "dequantize_permuted",
    "permute_cols",
    "GEMV_MAX_TOKENS",
]
