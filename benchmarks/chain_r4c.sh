#!/bin/bash
# Round-4 chain C: localize the bf16-scales e2e tax (footprint ask),
# roofline decode-only rates (fixed vmem sizing), attn grid re-run at
# the calibrated tolerance. Queues behind chain B on the one chip.
cd /root/repo
L=/tmp/chain_r4c.log
while ps -ef | grep -v grep | grep -q "[c]hain_r4b.sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,99))))
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

step scales_tax   4800 python benchmarks/scales_tax_probe.py
step decode_only  3000 python benchmarks/pair_decode_probe3.py decode
step kernel_race  3600 python benchmarks/pair_decode_probe3.py kernel
step attn_grid    3600 python benchmarks/onchip_validation.py attn
step parity_8b    5400 python -m quantizations_tpu.evals --proxy --preset 8b --parity
step prefill_diag 3600 python benchmarks/prefill_e2e.py --cases 512x1
step prefill_nofuse 3600 python benchmarks/prefill_e2e.py --no-fuse --cases 512x1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
