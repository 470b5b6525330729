#!/bin/bash
# Round-4 chain D: speculative replay curve on 8B (acceptance-controlled
# best case), paged page-size e2e race at max_seq 768, NF4 with fusion
# default check. Queues behind chain C.
cd /root/repo
L=/tmp/chain_r4d.log
while ps -ef | grep -v grep | grep -q "[c]hain_r4c.sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,101))))
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

step replay0      4800 python benchmarks/engine_probe.py --workload replay --spec-k 8
step replay30     4800 python benchmarks/engine_probe.py --workload replay --spec-k 8 --corrupt 0.3
step replay60     4800 python benchmarks/engine_probe.py --workload replay --spec-k 8 --corrupt 0.6
step paged768_256 4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 256
step paged768_384 4800 python benchmarks/engine_probe.py --engine paged --max-seq 768 --page-size 384
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
