#!/bin/bash
# Round-5 chain D: the int8 capacity line at 4k context (bf16 b32
# cache 17.2 GiB > HBM, int8 8.6 fits — the driver-visible form of
# int8 KV's remaining value after the 2k latency refutation) + a
# final plain bench at whatever default the r5c flash races settle.
cd /root/repo
L=/tmp/chain_r5d.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[abc].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,117))))
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

step kv_capacity_4k 7200 python benchmarks/kv_capacity_probe.py --max-seq 4096
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
