"""Model families. The reference delegates the model to HF transformers
(README.md:112); this framework owns the full TPU-native model + generate
path, with HF used only as checkpoint/tokenizer format."""

from .llama import (
    GEMMA2_9B,
    KVCache,
    LLAMA3_8B,
    LLAMA3_70B,
    LlamaConfig,
    LlamaParams,
    QLinear,
    TINY_LLAMA,
    decode_step,
    init_llama_params,
    prefill,
)

__all__ = [
    "LlamaConfig",
    "LlamaParams",
    "QLinear",
    "KVCache",
    "init_llama_params",
    "prefill",
    "decode_step",
    "LLAMA3_8B",
    "LLAMA3_70B",
    "GEMMA2_9B",
    "TINY_LLAMA",
]
