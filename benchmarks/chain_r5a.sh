#!/bin/bash
# Round-5 chain A (VERDICT r4 asks), priority-ordered so outages eat
# the tail, not the head:
#  #4  BENCH_r05 preview: plain bench.py with the nf4_b1 arm +
#      footprint companions.
#  #1  clean bf16x2 re-race (chain_r4f's ran through a sick backend:
#      compile_s 901, one 1.75s outlier iter; b1 55.6 vs fp32 61.9 with
#      b4 FLAT — re-measure under one healthy session before accepting
#      the refutation), then localization if it still regresses.
#  #2  int8 KV e2e at 2048-token context (slot bench + engine longctx).
#  #6  paged vs slot on the IDENTICAL mixed workload.
#  #7  IFEval proxy parity at n=109 examples / 120 instructions.
#  #3  b16/b32 refresh, prefill share/grid.
cd /root/repo
L=/tmp/chain_r5a.log
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,109))))
print('BACKEND_OK')" 2>/dev/null | grep -q BACKEND_OK
}
waitb() {
  for i in $(seq 1 200); do
    probe && return 0
    echo "# backend down, poll $i ($(date +%H:%M:%S))" >>"$L"
    sleep 90
  done
  return 1
}
step() {
  waitb || { echo "=== BACKEND NEVER CAME BACK, stopping ===" >>"$L"; exit 1; }
  echo "=== STEP $1 ($(date +%H:%M:%S)) ===" >>"$L"
  shift; t=$1; shift
  timeout "$t" "$@" >>"$L" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >>"$L"
}

# #4 BENCH_r05 preview at current defaults (fp32 control + clean nf4_b1)
step bench_default 5400 python bench.py
# #1 clean bf16x2 re-race, back-to-back with the control above
step bench_x2_clean 5400 python bench.py --scales-dtype bf16x2 --no-nf4-b1
# #2 slot-style 2k-context decode, both cache dtypes
step bench_2k_bf16 5400 python bench.py --max-seq 2048 --no-nf4-b1
step bench_2k_int8 5400 python bench.py --max-seq 2048 --kv-dtype int8 --no-nf4-b1
# #6 paged vs slot, identical workload (mixed, max_seq 768, p256)
step eng_slot      4800 python benchmarks/engine_probe.py --engine slot --max-seq 768
step eng_paged     4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 256
# #7 proxy IFEval parity at n=109/120
step ifeval_n109   9000 python -m quantizations_tpu.evals --ifeval-proxy --preset 8b
# #3 b16/b32 refresh (skip the nf4 arm: measured in bench_default)
step bench_sweep   5400 python bench.py --batch-sweep --no-nf4-b1
# #1 localize the bf16x2 b1 tax by op name (matters if x2_clean regresses)
step tax_x2_gen    6000 python benchmarks/scales_tax_probe.py --generate --fuse --layers 32 --batch 1 --dtypes fp32,bf16x2 --lean-embed
# #6 remaining engine arms
step eng_slot_spd4 4800 python benchmarks/engine_probe.py --engine slot --max-seq 768 --steps-per-dispatch 4
step eng_paged_spd4 4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 256 --steps-per-dispatch 4
step eng_paged_pfx 4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 256 --prefix-cache
step eng_paged_spec 4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 256 --workload replay --spec-k 6 --corrupt 0.05
# #2 long-context engine arms (8 live 1.5-1.9k-token streams)
step eng_lc_slot_bf16 5400 python benchmarks/engine_probe.py --engine slot --workload longctx --max-seq 2048 --requests 8
step eng_lc_slot_int8 5400 python benchmarks/engine_probe.py --engine slot --workload longctx --max-seq 2048 --requests 8 --kv-dtype int8
step eng_lc_paged_bf16 5400 python benchmarks/engine_probe.py --engine paged --workload longctx --max-seq 2048 --requests 8 --page-size 256
step eng_lc_paged_int8 5400 python benchmarks/engine_probe.py --engine paged --workload longctx --max-seq 2048 --requests 8 --page-size 256 --kv-dtype int8
# weak #2: explain the e2e-vs-kernel prefill MFU gap by op class
step prefill_share 5400 python benchmarks/prefill_share_probe.py
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
