from .gemv import (
    DEFAULT_LUT,
    gemv_4bit_pallas,
    gemv_4bit_pallas_stacked,
    pack_i32_rows,
    permute_activation,
)
from .lut import LUT_NAMES, make_lut
from .quantize import dequantize_4bit_pallas, quantize_4bit_pallas

__all__ = [
    "gemv_4bit_pallas",
    "gemv_4bit_pallas_stacked",
    "pack_i32_rows",
    "permute_activation",
    "LUT_NAMES",
    "make_lut",
    "DEFAULT_LUT",
    "quantize_4bit_pallas",
    "dequantize_4bit_pallas",
]
