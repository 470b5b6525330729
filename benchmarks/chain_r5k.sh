#!/bin/bash
# Round-5 chain K: complete the dispatch-amortization curve at round-5
# defaults (fused + 4-bit embedding): spd=8 for both engines, matching
# the r3 slot-spd8 197.4 row's knob on the identical mixed workload the
# r5 paged-vs-slot table uses.
cd /root/repo
L=/tmp/chain_r5k.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[a-j].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,133))))
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

step eng_slot_spd8  4800 python benchmarks/engine_probe.py --engine slot --max-seq 768 --steps-per-dispatch 8
step eng_paged_spd8 4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 256 --steps-per-dispatch 8
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
