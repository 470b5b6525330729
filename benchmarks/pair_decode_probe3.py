"""Round-4 decode-ceiling probe: VPU dtype op rates + pair-decode races.

The round-3 decomposition (manual_split_probe, PARITY.md) pinned the
[14336,4096] pair kernel at ~119 us with DMA 44 us / decode ~90 us /
scale ~27 us — VPU decode ops are the critical path (VERDICT r3 #1).
This probe answers the two questions that decide the round-4 attack:

1. ``rates``: what does one elementwise vreg-op cost per dtype?
   (int32 / int16 / int8 / bfloat16 / float32 chains inside a Pallas
   kernel, two-point slope over in-kernel op counts). If int16 ops
   retire 2 lanes per int32-lane-slot, a 16-bit-native decode halves
   the decode bound; if they run unpacked, the byte-SWAR int32 form is
   already near the VPU floor and PARITY.md gets a roofline proof.

2. ``decode``: pure decode-rate of each surviving pair strategy (no
   MXU, no scales): fp4 arith (byte-SWAR int32) and the NF4 all-tree
   plane set — the roofline inputs.

3. ``kernel``: the full fused matmul at [14336,4096] T=1 per strategy
   (the round-3 protocol; weights via consts= to dodge the tunnel's
   request-size limit).

Usage: python benchmarks/pair_decode_probe3.py [rates] [decode] [kernel]
(default: all three).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizations_tpu.utils.timing import time_scan_chain

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


# ---------------------------------------------------------------- rates

# Each group is (ops_per_application, fn). Chains are data-dependent so
# Mosaic cannot fold or CSE across applications.
INT_GROUPS = {
    "xorshift2": (2, lambda x: x ^ (x << 1)),
    "addshift2": (2, lambda x: x + (x >> 1)),
    "select4": (4, lambda x: jnp.where((x & 4) != 0, x + 3, x ^ 5)),
}
FLT_GROUPS = {
    "muladd2": (2, lambda x: x * 1.0009765625 + 0.125),
    "minmul2": (2, lambda x: jnp.minimum(x * 1.015625, 3.0)),
}


def _rate_kernel(x_ref, o_ref, *, group, n):
    x = x_ref[:]
    for _ in range(n):
        x = group(x)
    o_ref[:] = x


def measure_rate(dtype, name, group_ops, group, shape=(512, 512)):
    """Per-op seconds and effective lanes/s for a chained elementwise
    group on a VMEM-resident block."""
    if jnp.issubdtype(dtype, jnp.integer):
        x0 = jnp.asarray(
            np.random.default_rng(0).integers(1, 100, shape), dtype)
    else:
        x0 = jnp.asarray(
            np.random.default_rng(0).random(shape) + 0.5, dtype)

    def runner(n):
        kern = functools.partial(_rate_kernel, group=group, n=n)
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )
        return jax.jit(call)

    n1, n2 = 64, 256
    t1 = time_scan_chain(lambda x: runner(n1)(x), x0, iters=50)
    t2 = time_scan_chain(lambda x: runner(n2)(x), x0, iters=50)
    per_app = (t2 - t1) / (n2 - n1)
    per_op = per_app / group_ops
    elems = shape[0] * shape[1]
    lanes_per_s = elems / per_op if per_op > 0 else float("inf")
    print(f"RATE {np.dtype(dtype).name:9s} {name:10s} "
          f"per-op {per_op*1e9:8.3f} ns  "
          f"({lanes_per_s/1e12:7.3f} T lanes/s over {elems} elems)",
          flush=True)
    return per_op


def run_rates():
    print("== elementwise vreg-op rates (Pallas, VMEM-resident) ==",
          flush=True)
    for dt in (jnp.int32, jnp.int16, jnp.int8):
        for name, (ops, g) in INT_GROUPS.items():
            try:
                measure_rate(dt, name, ops, g)
            except Exception as e:
                print(f"RATE {np.dtype(dt).name:9s} {name:10s} "
                      f"FAILED: {str(e)[:200]}", flush=True)
    for dt in (jnp.float32, jnp.bfloat16):
        for name, (ops, g) in FLT_GROUPS.items():
            try:
                measure_rate(dt, name, ops, g)
            except Exception as e:
                print(f"RATE {np.dtype(dt).name:9s} {name:10s} "
                      f"FAILED: {str(e)[:200]}", flush=True)


# --------------------------------------------------------------- decode

def _decode_kernel(w_ref, o_ref, *, pair_fn, n, has_tbl, tbl_ref=None):
    w = w_ref[:]
    acc = jnp.zeros_like(w)
    for i in range(n):
        wi = w ^ i          # 1 op; defeats CSE across applications
        outs = pair_fn(wi)
        for o in outs:
            if o.dtype != jnp.int32:
                # fold 16-bit planes pairwise so acc stays int32-shaped
                o = pltpu.bitcast(o, jnp.int32)
            acc = acc ^ o
    o_ref[:] = acc


def decode_only(name, pair_fn, shape=(256, 512)):
    """Pure decode rate: us per application over a [256,512] word block
    (= 1M codes/application; larger blocks OOM scoped vmem with the
    n=16 chained applications — chain_r4a)."""
    w0 = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**32, shape, dtype=np.uint32).astype(np.int64).astype(np.int32))

    def runner(n):
        kern = functools.partial(_decode_kernel, pair_fn=pair_fn, n=n,
                                 has_tbl=False)
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )
        return jax.jit(call)

    n1, n2 = 4, 16
    t1 = time_scan_chain(lambda x: runner(n1)(x), w0, iters=50)
    t2 = time_scan_chain(lambda x: runner(n2)(x), w0, iters=50)
    per_app = (t2 - t1) / (n2 - n1)
    codes = shape[0] * shape[1] * 8
    print(f"DECODE {name:12s} {per_app*1e6:8.2f} us/app "
          f"({codes/per_app/1e12:6.2f} T codes/s)", flush=True)
    return per_app


def run_decode():
    print("== pure decode rates (no MXU, no scales) ==", flush=True)
    from quantizations_tpu.ops.lut import (
        fp4_pair_patterns_all,
        pair_patterns_tree,
    )
    from quantizations_tpu.quant.codebooks import NF4_CODE

    for name, fn in (
        ("fp4_arith", fp4_pair_patterns_all),
        ("nf4_tree32", lambda w: [
            pair_patterns_tree(w, 4 * p, NF4_CODE) for p in range(4)]),
    ):
        try:
            decode_only(name, fn)
        except Exception as e:
            print(f"DECODE {name}: FAILED {str(e)[:200]}", flush=True)


# --------------------------------------------------------------- kernel

def run_kernel():
    print("== fused kernel race [14336,4096] T=1 ==", flush=True)
    from quantizations_tpu.ops.qmatmul import (
        matmul_4bit_pair_pallas,
        pack_pair_rows,
    )

    rng = np.random.default_rng(0)
    M, K = 14336, 4096
    by = jnp.asarray(rng.integers(0, 256, (M, K // 2),
                                  dtype=np.int64).astype(np.int32))
    wp2 = pack_pair_rows(by.reshape(-1), M, K)
    scales = jnp.asarray(rng.random((M, K // 64), np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))

    cases = [("fp4", "arith"), ("nf4", "mix")]
    ref = {}
    for qt, dec in cases:
        fn = functools.partial(matmul_4bit_pair_pallas, quant_type=qt,
                               decode=None if dec in ("arith", "mix")
                               else dec)
        try:
            out = np.asarray(fn(wp2, scales, x))
            if qt in ref:
                same = bool((out == ref[qt]).all())
                print(f"KERNEL {qt}/{dec}: bit-identical to default: "
                      f"{same}", flush=True)
            else:
                ref[qt] = out
            t = time_scan_chain(
                lambda xx, w, s: fn(w, s, xx), x, iters=100,
                consts=(wp2, scales))
            gbps = (M * K / 2) / t / 1e9
            print(f"KERNEL {qt:4s}/{dec:7s} {t*1e6:8.1f} us  "
                  f"({gbps:6.1f} GB/s weight stream)", flush=True)
        except Exception as e:
            print(f"KERNEL {qt}/{dec}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["rates", "decode", "kernel"]
    if "ilp" in modes:
        run_ilp()
    if "rates" in modes:
        run_rates()
    if "decode" in modes:
        run_decode()
    if "kernel" in modes:
        run_kernel()


# ------------------------------------------------------------ ilp rates

def _ilp_kernel(x_ref, o_ref, *, n, dtype):
    """8 INDEPENDENT multiply chains (ILP-exposed) — measures packed
    THROUGHPUT rather than the serial chains' latency: if Mosaic packs
    bf16 elementwise ops 2/lane, the bf16 throughput here doubles the
    serial-chain rate and the pair kernel's 27us scale stage has
    headroom; if not, the stage is at its floor."""
    xs = [x_ref[:] + jnp.asarray(i, dtype) for i in range(8)]
    for _ in range(n):
        xs = [x * jnp.asarray(1.0009765625, dtype) for x in xs]
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[:] = acc


def run_ilp():
    import functools as ft
    print("== ILP-exposed elementwise throughput (8 chains) ==",
          flush=True)
    shape = (256, 512)
    for dtype in (jnp.float32, jnp.bfloat16, jnp.int32):
        x0 = jnp.asarray(
            np.random.default_rng(0).random(shape) + 0.5, jnp.float32
        ).astype(dtype)

        def runner(n):
            if jnp.issubdtype(dtype, jnp.integer):
                kern = ft.partial(_rate_kernel, n=n,
                                  group=lambda x: x + (x >> 1))
                opsper = 2 * n
            else:
                kern = ft.partial(_ilp_kernel, n=n, dtype=dtype)
                opsper = 8 * n
            call = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
            )
            return jax.jit(call), opsper

        n1, n2 = 32, 128
        r1, o1 = runner(n1)
        r2, o2 = runner(n2)
        t1 = time_scan_chain(lambda x: r1(x), x0, iters=50)
        t2 = time_scan_chain(lambda x: r2(x), x0, iters=50)
        per_op = (t2 - t1) / (o2 - o1)
        elems = shape[0] * shape[1]
        print(f"ILP {np.dtype(dtype).name:9s} per-op {per_op*1e9:8.3f} ns"
              f"  ({elems/per_op/1e12:7.3f} T lanes/s)", flush=True)
