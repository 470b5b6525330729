#!/bin/bash
# Round-5 chain I: the prefill dispatch-crossover e2e race.
# The r5 trace decomposition showed the dense prefill path pays ~52 ms
# per T=512 call in dequant materialization + stacked-word copies that
# the r3 KERNEL-level crossover race (dense 625us vs pair 782us at
# [14336,4096] T=512) never counted. QT_PAIR_MAX_TOKENS=4096 routes
# prefill through the in-VMEM pair kernels instead — if e2e wins, the
# crossover default flips and prefill gains up to ~1.7x.
cd /root/repo
L=/tmp/chain_r5i.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[a-h].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,129))))
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

step prefill_pair 7200 env QT_PAIR_MAX_TOKENS=4096 python benchmarks/prefill_e2e.py --cases 512x1,512x8,2048x1
step prefill_pair_share 5400 env QT_PAIR_MAX_TOKENS=4096 python benchmarks/prefill_share_probe.py --cases 512x1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
