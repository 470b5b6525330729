#!/bin/bash
# Round-5 chain B (follow-ups from chain_r5a's findings):
#  - int8 KV lost the 2k-ctx latency race at every batch (58.1/194.6/
#    317.8 vs bf16's 59.3/203.4/347.4). Its remaining claim is
#    CAPACITY: at 2048 ctx a bf16 cache is 268 MB/row (b32 = 8.6 GB
#    + 4.2 GB weights > v5e HBM) while int8 halves it. Measure the
#    b16/b32 sweep on the int8 cache (expected to fit), and the bf16
#    arm at b16 only (b32 expected OOM — the supervisor records the
#    failure line, which IS the capacity evidence).
#  - prefill fused-vs-unfused race: chain_r4f's fused T=512 B=1 was
#    156 ms vs the round-1 unfused 134 ms — decompose.
# Queues behind chain_r5a.
cd /root/repo
L=/tmp/chain_r5b.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5a.sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,111))))
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

step bench_2k_sweep_int8 7200 python bench.py --max-seq 2048 --kv-dtype int8 --batch-sweep --no-nf4-b1
step bench_2k_sweep_bf16 7200 python bench.py --max-seq 2048 --batch-sweep --no-nf4-b1
step prefill_unfused 5400 python benchmarks/prefill_e2e.py --no-fuse --cases 512x1,2048x1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
