"""Paged-attention tax sweep (VERDICT #8): page-size / DMA-granularity
race of `paged_flash_decode_attention` against the slot-cache
`flash_decode_attention_stacked` at decode shapes.

Known numbers (serve/paged.py): b8 ~1900-ctx step 47.1 ms paged vs
35.2 ms slot (~25-34% tax). The paged kernel's per-step DMA is one
(page, D) tile per K/V — 32 KB at page=128, half the slot kernel's
s_blk=256 unit, and the grid walks ALL max_pages pages even past a
row's length (masked in softmax but still fetched).

Variants:
  slot          : flash_decode_attention_stacked (s_blk 256)
  paged_pN      : production kernel, page size N
  pagedxM_pN    : production kernel, pages_per_step=M — M consecutive
                  logical pages fetched per grid step (each its own
                  block-table DMA, issued together: deeper copy
                  pipelining against the small-DMA latency tax)
  pagedcl_pN    : + index-map CLAMP — pages past the row's length alias
                  the last valid page id, so Pallas skips the refetch
                  (same-index blocks are not re-DMAd); softmax masking
                  already handles correctness. Pays off for mixed
                  lengths (measured with half the rows at 1/4 length).

Pages are allocated round-robin interleaved across sequences (the
realistic fragmented layout, not contiguous).
"""
import functools, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from quantizations_tpu.ops.attention import (
    flash_decode_attention_stacked, _kernel)
from quantizations_tpu.ops.paged_attention import (
    paged_flash_decode_attention, paged_flash_decode_attention_i8)
from quantizations_tpu.utils.timing import time_scan_chain

L = 4          # enough layers to make layer indexing real
KVH, G, D = 8, 4, 128
CTX = 1536     # ~long context, divisible by 128/256/384/512


def paged_clamped(q, pages_k, pages_v, block_table, layer_idx, lengths):
    """Clamp variant of paged_flash_decode_attention."""
    B, KVH_, G_, D_ = q.shape
    Lp, P, _, page, _ = pages_k.shape
    max_pages = block_table.shape[1]
    scale = D_ ** -0.5

    kernel = functools.partial(_kernel, s_blk=page, scale=scale,
                               n_kv=KVH_, len_off=1 + B * max_pages)

    def k_wrap(scalars_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
               acc_scr):
        kernel(scalars_ref, q_ref, k_ref[0], v_ref[0], o_ref,
               m_scr, l_scr, acc_scr)

    def page_of(i, sq, sc):
        b = i // KVH_
        length = sc[1 + B * max_pages + b]
        last = jax.lax.max((length - 1) // page, 0)
        sqc = jax.lax.min(sq, last)
        return sc[1 + b * max_pages + sqc]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * KVH_, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, G_, D_),
                         lambda i, sq, sc: (i // KVH_, i % KVH_, 0, 0)),
            pl.BlockSpec((1, 1, 1, page, D_),
                         lambda i, sq, sc: (sc[0], page_of(i, sq, sc),
                                            i % KVH_, 0, 0)),
            pl.BlockSpec((1, 1, 1, page, D_),
                         lambda i, sq, sc: (sc[0], page_of(i, sq, sc),
                                            i % KVH_, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G_, D_), lambda i, sq, sc: (i // KVH_, i % KVH_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G_, 128), jnp.float32),
            pltpu.VMEM((G_, 128), jnp.float32),
            pltpu.VMEM((G_, D_), jnp.float32),
        ],
    )
    scalars = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(block_table, jnp.int32).reshape(B * max_pages),
        jnp.asarray(lengths, jnp.int32).reshape(B)])
    return pl.pallas_call(
        k_wrap,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH_, G_, D_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(scalars, q, pages_k, pages_v)


paged_clamped_j = jax.jit(paged_clamped)


def build(B, page, lengths):
    rng = np.random.default_rng(0)
    max_pages = CTX // page
    P = B * max_pages + 8
    pages_k = jnp.asarray(
        rng.standard_normal((L, P, KVH, page, D)).astype(np.float32) * .1
    ).astype(jnp.bfloat16)
    pages_v = jnp.asarray(
        rng.standard_normal((L, P, KVH, page, D)).astype(np.float32) * .1
    ).astype(jnp.bfloat16)
    # round-robin interleaved allocation across sequences
    table = np.zeros((B, max_pages), np.int32)
    nxt = 0
    for j in range(max_pages):
        for b in range(B):
            table[b, j] = nxt % P
            nxt += 1
    # slot-layout twin for the reference kernel: gather pages back
    ck = np.zeros((L, B, KVH, CTX, D), np.float32)
    cv = np.zeros((L, B, KVH, CTX, D), np.float32)
    pk = np.asarray(pages_k, np.float32)
    pv = np.asarray(pages_v, np.float32)
    for b in range(B):
        for j in range(max_pages):
            ck[:, b, :, j*page:(j+1)*page] = pk[:, table[b, j]]
            cv[:, b, :, j*page:(j+1)*page] = pv[:, table[b, j]]
    q = jnp.asarray(rng.standard_normal((B, KVH, G, D)).astype(np.float32))
    return (q, pages_k, pages_v, jnp.asarray(table),
            jnp.asarray(ck, jnp.bfloat16), jnp.asarray(cv, jnp.bfloat16),
            jnp.asarray(lengths, jnp.int32))


def main():
    li = jnp.int32(L - 1)
    for B in (1, 8):
        uni = np.full(B, CTX, np.int32)
        mixed = uni.copy()
        mixed[::2] = CTX // 4
        q, pk, pv, tbl, ck, cv, lens = build(B, 128, uni)
        ref = np.asarray(flash_decode_attention_stacked(
            q, ck, cv, li, lens))
        dt = time_scan_chain(
            lambda qq, k, v: flash_decode_attention_stacked(
                qq, k, v, li, lens),
            q, iters=300, trials=2, consts=(ck, cv))
        print(f"B={B} slot          {dt*1e6:8.1f}us", flush=True)

        for page in (128, 256, 384):
            for name, lengths in (("uni", uni), ("mix", mixed)):
                q, pk, pv, tbl, ck, cv, lens = build(B, page, lengths)
                out = np.asarray(paged_flash_decode_attention(
                    q, pk, pv, tbl, li, lens))
                if name == "uni":
                    err = np.max(np.abs(out - ref))
                else:
                    err = float("nan")
                dt = time_scan_chain(
                    lambda qq, k, v: paged_flash_decode_attention(
                        qq, k, v, tbl, li, lens),
                    q, iters=300, trials=2, consts=(pk, pv))
                print(f"B={B} paged_p{page:<4d}{name} {dt*1e6:8.1f}us "
                      f"(maxerr {err:.1e})", flush=True)

                for pps in (2, 4):
                    if (CTX // page) % pps:
                        continue
                    outm = np.asarray(paged_flash_decode_attention(
                        q, pk, pv, tbl, li, lens, pages_per_step=pps))
                    errm = np.max(np.abs(outm - out))
                    dt = time_scan_chain(
                        lambda qq, k, v, _pps=pps:
                        paged_flash_decode_attention(
                            qq, k, v, tbl, li, lens, pages_per_step=_pps),
                        q, iters=300, trials=2, consts=(pk, pv))
                    print(f"B={B} pagedx{pps}_p{page:<4d}{name} "
                          f"{dt*1e6:6.1f}us (vs prod {errm:.1e})",
                          flush=True)

                outc = np.asarray(paged_clamped_j(
                    q, pk, pv, tbl, li, lens))
                errc = np.max(np.abs(outc - out))
                dt = time_scan_chain(
                    lambda qq, k, v: paged_clamped_j(
                        qq, k, v, tbl, li, lens),
                    q, iters=300, trials=2, consts=(pk, pv))
                print(f"B={B} pagedcl_p{page:<4d}{name} {dt*1e6:6.1f}us "
                      f"(vs prod {errc:.1e})", flush=True)

                if name == "uni":
                    # int8 pool: half the code bytes per page DMA
                    rs = np.random.default_rng(1)
                    step_k = jnp.asarray(np.abs(np.asarray(
                        pk, np.float32)).max(-1) / 127.0, jnp.bfloat16)
                    step_v = jnp.asarray(np.abs(np.asarray(
                        pv, np.float32)).max(-1) / 127.0, jnp.bfloat16)
                    pk8 = jnp.asarray(np.clip(np.round(
                        np.asarray(pk, np.float32)
                        / np.maximum(np.asarray(step_k, np.float32),
                                     1e-12)[..., None]),
                        -127, 127), jnp.int8)
                    pv8 = jnp.asarray(np.clip(np.round(
                        np.asarray(pv, np.float32)
                        / np.maximum(np.asarray(step_v, np.float32),
                                     1e-12)[..., None]),
                        -127, 127), jnp.int8)
                    out8 = np.asarray(paged_flash_decode_attention_i8(
                        q, pk8, pv8, step_k, step_v, tbl, li, lens))
                    err8 = np.max(np.abs(out8 - out))
                    dt = time_scan_chain(
                        lambda qq, k, v: paged_flash_decode_attention_i8(
                            qq, k, v, step_k, step_v, tbl, li, lens),
                        q, iters=300, trials=2, consts=(pk8, pv8))
                    print(f"B={B} paged8_p{page:<4d}{name} "
                          f"{dt*1e6:7.1f}us (vs bf16 {err8:.1e})",
                          flush=True)


if __name__ == "__main__":
    main()
