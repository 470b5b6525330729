"""File-level bitsandbytes checkpoint interop (HF flat-key format).

The reference is drop-in for HF's bnb 4-bit serialization: its
``QuantState.valid_qs_keys`` (reference core.py:29-42) names exactly the
flat tensor keys HF writes next to each quantized ``...weight``:

    <prefix>.weight                                  uint8 [ceil(n/2), 1]
    <prefix>.weight.absmax                           uint8 (nested) / fp32
    <prefix>.weight.quant_map                        fp32 [16]
    <prefix>.weight.nested_absmax                    fp32   (double quant)
    <prefix>.weight.nested_quant_map                 fp32 [256]
    <prefix>.weight.quant_state.bitsandbytes__fp4    uint8 JSON metadata
                                    (or ...__nf4)

The JSON tensor is the UTF-8 encoding of the non-tensor quant-state
fields (blocksize / dtype / shape / quant_type / nested_*) — the
serialization HF's bnb integration produces via
``QuantState.as_dict(packed=True)``. This module reads and writes that
exact format so real pre-quantized HF checkpoints load directly into
:class:`~quantizations_tpu.nn.linear.Linear4bit` / ``QLinear``.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .state import QuantState

__all__ = [
    "bnb_flat_tensors",
    "parse_bnb_flat",
    "is_bnb_quantized",
    "qlinear_arrays_from_bnb",
    "load_bnb_linear4bit",
]

_META_KEYS = ("quant_type", "blocksize", "dtype", "shape",
              "nested_blocksize", "nested_dtype", "nested_offset")


def bnb_flat_tensors(prefix: str, packed: np.ndarray,
                     state: QuantState) -> Dict[str, np.ndarray]:
    """Export one quantized linear as the HF-bnb flat tensor dict.

    ``prefix`` is the module path (e.g. ``model.layers.0.self_attn.q_proj``);
    ``packed`` the uint8 payload in bnb shape ``[ceil(n/2), 1]``.
    """
    d = state.as_dict()
    meta = dict(d["quant_state"])
    meta["shape"] = list(meta["shape"])
    out = {
        f"{prefix}.weight": np.asarray(packed, np.uint8),
        f"{prefix}.weight.absmax": np.asarray(d["absmax"]),
        f"{prefix}.weight.quant_map": np.asarray(d["quant_map"], np.float32),
    }
    if "nested_absmax" in d:
        out[f"{prefix}.weight.nested_absmax"] = np.asarray(
            d["nested_absmax"], np.float32)
        out[f"{prefix}.weight.nested_quant_map"] = np.asarray(
            d["nested_quant_map"], np.float32)
    js = json.dumps({k: meta[k] for k in _META_KEYS if k in meta})
    out[f"{prefix}.weight.quant_state.bitsandbytes__{state.quant_type}"] = (
        np.frombuffer(js.encode("utf-8"), dtype=np.uint8).copy())
    return out


def _qs_key(names, prefix: str) -> Optional[str]:
    for qt in ("fp4", "nf4"):
        k = f"{prefix}.weight.quant_state.bitsandbytes__{qt}"
        if k in names:
            return k
    return None


def is_bnb_quantized(names, prefix: str) -> bool:
    """Whether ``prefix`` is stored bnb-4bit-quantized in a tensor set."""
    return _qs_key(names, prefix) is not None


def parse_bnb_flat(get: Callable[[str], np.ndarray], names, prefix: str,
                   ) -> Tuple[np.ndarray, QuantState]:
    """Parse one linear's flat bnb keys -> (packed uint8, QuantState).

    ``get`` maps a tensor name to its array (streaming-friendly);
    ``names`` is the available key set.
    """
    qs_key = _qs_key(names, prefix)
    if qs_key is None:
        raise KeyError(f"{prefix} is not bnb-4bit serialized")
    meta = json.loads(bytes(np.asarray(get(qs_key), np.uint8)).decode("utf-8"))
    d: Dict[str, Any] = {
        "absmax": np.asarray(get(f"{prefix}.weight.absmax")),
        "quant_state": meta,
    }
    qm = f"{prefix}.weight.quant_map"
    if qm in names:
        d["quant_map"] = np.asarray(get(qm))
    na = f"{prefix}.weight.nested_absmax"
    if na in names:
        d["nested_absmax"] = np.asarray(get(na))
        d["nested_quant_map"] = np.asarray(
            get(f"{prefix}.weight.nested_quant_map"))
    state = QuantState.from_dict(d)
    packed = np.asarray(get(f"{prefix}.weight"), np.uint8)
    return packed, state


def qlinear_arrays_from_bnb(packed: np.ndarray, state: QuantState,
                            layout: str = "planar",
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """bnb payload -> the TPU runtime arrays ``(wp, scales)``.

    ``wp`` is the int32-word view of the packed bytes ([M, K/8] planar or
    the SWAR pair layout), ``scales`` the RESOLVED fp32 per-64 absmax
    (double quantization inverted once here, fixing the per-call decode
    at reference core.py:467).
    """
    from ..ops.gemv import pack_i32_rows
    from .functional import dequantize_absmax

    out_f, in_f = state.shape
    wp = pack_i32_rows(jnp.asarray(packed.reshape(-1)), out_f, in_f)
    scales = dequantize_absmax(state).reshape(out_f, in_f // state.blocksize)
    if state.blocksize != 64:
        scales = jnp.repeat(scales, state.blocksize // 64, axis=1)
    if layout == "pair":
        from ..ops.qmatmul import planar_to_pair

        wp = planar_to_pair(wp)
    return wp, scales


def load_bnb_linear4bit(get: Callable[[str], np.ndarray], names,
                        prefix: str, compute_dtype: Any = jnp.bfloat16):
    """Load one bnb-serialized linear into a :class:`Linear4bit`."""
    from ..nn.linear import Linear4bit, Params4bit

    packed, state = parse_bnb_flat(get, names, prefix)
    wp, scales = qlinear_arrays_from_bnb(packed, state)
    bias = None
    bk = f"{prefix}.bias"
    if bk in names:
        bias = jnp.asarray(np.asarray(get(bk), np.float32))
    return Linear4bit(
        weight=Params4bit(wp=wp, scales=scales, quant_state=state),
        bias=bias, compute_dtype=compute_dtype)
