#!/bin/bash
# Round-4 chain B: validation grid -> headline -> footprint split ->
# accuracy evidence (8B parity + IFEval proxy) -> speculative best-case
# -> prefill refresh -> paged page-size e2e race.
# Waits for chain A (same chip) to exit first, then runs serially with
# a backend-wait preamble per step.
cd /root/repo
L=/tmp/chain_r4b.log
while pgrep -x chain_r4a.sh >/dev/null 2>&1 || ps -ef | grep -v grep | grep -q "[c]hain_r4a.sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,97))))
print('BACKEND_OK')" 2>/dev/null | grep -q BACKEND_OK
}
waitb() {
  for i in $(seq 1 160); do
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

step valid_grid    3600 python benchmarks/onchip_validation.py pair attn
step bench_fp4     4800 python bench.py
step bench_leansc  4800 python bench.py --lean-scales
step bench_leanemb 4800 python bench.py --lean-embed
step bench_lean    4800 python bench.py --lean
step bench_nf4     4800 python bench.py --quant-type nf4
step parity_8b     5400 python -m quantizations_tpu.evals --proxy --preset 8b --parity
step parity_8b_i8  5400 python -m quantizations_tpu.evals --proxy --preset 8b --parity --kv-dtype int8
step ifeval_8b     5400 python -m quantizations_tpu.evals --ifeval-proxy --preset 8b --max-new-tokens 96
step spec_repet    4800 python benchmarks/engine_probe.py --workload repetitive --spec-k 8
step spec_repet0   4800 python benchmarks/engine_probe.py --workload repetitive
step prefill_e2e   5400 python benchmarks/prefill_e2e.py
step paged_p384    4800 python benchmarks/engine_probe.py --engine paged --page-size 384
step paged_p256    4800 python benchmarks/engine_probe.py --engine paged --page-size 256
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
