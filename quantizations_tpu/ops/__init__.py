from .gemv import gemv_4bit_pallas, pack_i32_rows, permute_activation
from .lut import LUT_NAMES, make_lut

__all__ = [
    "gemv_4bit_pallas",
    "pack_i32_rows",
    "permute_activation",
    "LUT_NAMES",
    "make_lut",
]
