"""Model families. The reference delegates the model to HF transformers
(README.md:112); this framework owns the full TPU-native model + generate
path, with HF used only as checkpoint/tokenizer format."""

from .llama import (
    KVCache,
    LlamaConfig,
    LlamaParams,
    QLinear,
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
]
