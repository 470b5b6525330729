from .codebooks import (
    FP4_CODE,
    NF4_CODE,
    create_dynamic_map,
    get_4bit_code,
)
from .functional import (
    dequantize_4bit,
    dequantize_absmax,
    dequantize_blockwise,
    gemv_4bit,
    matmul_4bit,
    pack_4bit,
    quantize_4bit,
    quantize_blockwise,
    unpack_4bit,
)
from .state import QuantState, valid_qs_keys

__all__ = [
    "FP4_CODE",
    "NF4_CODE",
    "create_dynamic_map",
    "get_4bit_code",
    "QuantState",
    "valid_qs_keys",
    "quantize_4bit",
    "dequantize_4bit",
    "quantize_blockwise",
    "dequantize_blockwise",
    "dequantize_absmax",
    "gemv_4bit",
    "matmul_4bit",
    "pack_4bit",
    "unpack_4bit",
]
