#!/bin/bash
# Round-4 chain F: bf16x2 packed-scale storage (VERDICT r3 #5 — the
# <=25% HBM footprint ask) + the 8B parity chaos-floor control.
#  1. onchip_validation pair: the new bf16x2 kernel cells must be
#     bit-identical ON HARDWARE (host pack vs pltpu.bitcast sublane
#     convention — interpret mode is self-consistent and can't see a
#     mismatch).
#  2. parity + parity-control at 8B: decompose chain C's top1 0.742 /
#     KL 0.446 into quantization error vs implementation-rounding
#     chaos (both arms dense in the control).
#  3. e2e race: default fp32 scales vs bf16x2 at the bench default
#     config (fused + 4-bit embedding). Accept bf16x2 if within 3% b1.
#  4. full prefill e2e grid (fusion on; VERDICT r3 #8 refresh).
# Queues behind chain E.
cd /root/repo
L=/tmp/chain_r4f.log
while ps -ef | grep -v grep | grep -q "[c]hain_r4[de].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,107))))
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

step onchip_pair   2400 python benchmarks/onchip_validation.py pair
step parity_ctl_8b 7200 python -m quantizations_tpu.evals --proxy --preset 8b --parity --parity-control
step bench_fp32    4800 python bench.py
step bench_bf16x2  4800 python bench.py --scales-dtype bf16x2
step bench_x2_nf4  4800 python bench.py --scales-dtype bf16x2 --quant-type nf4
step prefill_grid  7200 python benchmarks/prefill_e2e.py
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
