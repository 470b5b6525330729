"""QuantState: the pytree container describing how to invert quantization.

TPU-native equivalent of ``QuantState`` (reference core.py:23-88). Unlike
the reference (a plain mutable object holding torch tensors), this is a
registered JAX pytree (via flax.struct) so it can flow through ``jit``,
``shard_map`` and be sharded with the packed weights.

Serialization uses the bitsandbytes key schema (``valid_qs_keys``,
reference core.py:29-42) so pre-quantized bnb checkpoints round-trip.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .codebooks import create_dynamic_map, get_4bit_code

__all__ = ["QuantState", "valid_qs_keys", "VALID_QUANT_TYPES"]

VALID_QUANT_TYPES = ("fp4", "nf4")

# bnb serialization key schema — reference core.py:29-42.
valid_qs_keys = [
    "absmax",
    "quant_map",
    "nested_absmax",
    "nested_quant_map",
    "quant_state",
    "quant_type",
    "blocksize",
    "dtype",
    "shape",
    "nested_blocksize",
    "nested_dtype",
    "nested_offset",
]


@struct.dataclass
class QuantState:
    """Everything needed to invert a blockwise quantization.

    Fields mirror reference core.py:44-76:

    - ``absmax``: per-block scale statistics. float32 ``[nblocks]`` when not
      nested; uint8 codes ``[nblocks]`` when ``state2`` is set (the absmax
      itself is 8-bit quantized against the dynamic map — "double
      quantization", reference core.py:563-576).
    - ``code``: the codebook the payload was quantized against (16-entry
      FP4/NF4 for weights, 256-entry dynamic map for statistics).
    - ``offset``: mean of the raw absmax, subtracted before the nested 8-bit
      quantization (reference core.py:563-564). None when not nested.
    - ``state2``: nested QuantState of the quantized absmax.
    - ``blocksize`` / ``quant_type`` / ``dtype`` / ``shape``: static
      metadata of the quantized payload.
    """

    absmax: jnp.ndarray
    code: jnp.ndarray
    offset: Optional[jnp.ndarray] = None
    state2: Optional["QuantState"] = None
    blocksize: int = struct.field(pytree_node=False, default=64)
    quant_type: str = struct.field(pytree_node=False, default="fp4")
    dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)
    shape: tuple = struct.field(pytree_node=False, default=())

    @property
    def nested(self) -> bool:
        return self.state2 is not None

    # -- bnb-compatible serialization (reference core.py:29-42 schema) -----

    def as_dict(self, packed: Optional[np.ndarray] = None) -> dict:
        """Export in the bitsandbytes quant_state dict layout.

        Keys follow ``valid_qs_keys``; tensors are numpy. ``packed`` (the
        uint8 payload) is not part of the dict in bnb either — it is stored
        as the parameter itself.
        """
        qs_meta = {
            "quant_type": self.quant_type,
            "blocksize": self.blocksize,
            "dtype": str(jnp.dtype(self.dtype).name),
            "shape": tuple(int(s) for s in self.shape),
        }
        out = {
            "absmax": np.asarray(self.absmax),
            "quant_map": np.asarray(self.code),
        }
        if self.nested:
            st2 = self.state2
            out["nested_absmax"] = np.asarray(st2.absmax)
            out["nested_quant_map"] = np.asarray(st2.code)
            qs_meta["nested_blocksize"] = st2.blocksize
            qs_meta["nested_dtype"] = str(jnp.dtype(st2.dtype).name)
            qs_meta["nested_offset"] = float(np.asarray(self.offset))
        out["quant_state"] = qs_meta
        return out

    @classmethod
    def from_dict(cls, d: dict) -> "QuantState":
        """Reconstruct from the bnb dict layout produced by :meth:`as_dict`
        (or loaded from a bnb checkpoint's ``weight.quant_state.*`` keys)."""
        meta = d["quant_state"]
        quant_type = meta["quant_type"]
        blocksize = int(meta["blocksize"])
        dtype = jnp.dtype(meta["dtype"])
        shape = tuple(meta["shape"])
        code = jnp.asarray(
            d.get("quant_map", get_4bit_code(quant_type)), jnp.float32
        )
        nested = "nested_offset" in meta or "nested_absmax" in d
        if nested:
            state2 = cls(
                absmax=jnp.asarray(d["nested_absmax"], jnp.float32),
                code=jnp.asarray(
                    d.get("nested_quant_map", create_dynamic_map()),
                    jnp.float32,
                ),
                blocksize=int(meta.get("nested_blocksize", 256)),
                quant_type="dynamic8bit",
                dtype=jnp.dtype(meta.get("nested_dtype", "float32")),
                shape=(int(np.asarray(d["absmax"]).size),),
            )
            return cls(
                absmax=jnp.asarray(d["absmax"], jnp.uint8),
                code=code,
                offset=jnp.asarray(meta["nested_offset"], jnp.float32),
                state2=state2,
                blocksize=blocksize,
                quant_type=quant_type,
                dtype=dtype,
                shape=shape,
            )
        return cls(
            absmax=jnp.asarray(d["absmax"], jnp.float32),
            code=code,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=dtype,
            shape=shape,
        )
