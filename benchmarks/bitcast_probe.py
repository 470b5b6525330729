"""Probe the EXACT layout mapping of pltpu.bitcast(int32 -> bf16) inside
a Mosaic kernel, by stamping each 16-bit half of every int32 element with
a unique marker and reading back where it lands.

If the mapping is a fixed, lane-independent bijection, a pair-SWAR decode
(two bf16 patterns assembled per int32 lane) can pre-invert it in the HBM
weight layout — the earlier bf16-pair experiment died on this mapping
being "scattered"; this probe characterizes the scatter precisely.

    python benchmarks/bitcast_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def probe(rows, cols):
    # marker: unique 15-bit id per (element, half): id = (r*cols + c)*2 + h
    ids = np.arange(rows * cols, dtype=np.uint32).reshape(rows, cols)
    lo = (ids * 2).astype(np.uint32)
    hi = (ids * 2 + 1).astype(np.uint32)
    x = (lo | (hi << 16)).view(np.int32)

    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)

    out_shape = None
    # let pallas tell us the output shape by trying candidates
    for cand in [(rows * 2, cols), (rows, cols * 2)]:
        try:
            out = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(cand, jnp.bfloat16),
            )(jnp.asarray(x))
            got = np.asarray(out).view(np.uint16).astype(np.uint32)
            out_shape = cand
            break
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"  shape {cand}: {msg}")
    if out_shape is None:
        print("  no candidate shape worked")
        return

    R, C = got.shape
    print(f"int32[{rows},{cols}] -> bf16{list(got.shape)}")
    # decode marker back to (r, c, half)
    ids_out = got // 2
    half = got % 2
    r_src = ids_out // cols
    c_src = ids_out % cols
    # check lane-consistency: does (r_out -> (r_src, half)) depend on c?
    lane_consistent = bool(
        np.all(r_src == r_src[:, :1]) and np.all(half == half[:, :1])
        and np.all(c_src == np.arange(C)[None, :] % cols))
    print(f"  lane-independent sublane mapping: {lane_consistent}")
    if C == cols:
        for r_out in range(min(R, 32)):
            print(f"  out row {r_out:3d} <- src row {r_src[r_out,0]:3d} "
                  f"half {half[r_out,0]}")
    else:
        # lanes doubled: show mapping of first rows/lanes
        for r_out in range(min(R, 4)):
            pairs = [(int(r_src[r_out, c]), int(c_src[r_out, c]),
                      int(half[r_out, c])) for c in range(8)]
            print(f"  out row {r_out}: first lanes <- {pairs}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for rows, cols in [(8, 128), (16, 256), (32, 512)]:
        probe(rows, cols)
