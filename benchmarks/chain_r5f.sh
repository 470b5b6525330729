#!/bin/bash
# Round-5 chain F: scheduler-flag races for the bf16x2 b1 tax.
# The tax is XLA-scheduler-level (same named copies run slower in the
# bf16x2 scan body; kernels neutral; attention-impl-independent and
# pipeline-independent). The latency-hiding scheduler is the knob that
# owns exactly that overlap; race it both ways under both storages.
# (The axon compile helper forwards proto-backed xla_* flags
# per-compile, so client XLA_FLAGS reach the remote compiler.)
cd /root/repo
L=/tmp/chain_r5f.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[abcde].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,121))))
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

step x2_lhs_off 5400 env XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=false" python bench.py --scales-dtype bf16x2 --no-nf4-b1
step fp32_lhs_off 5400 env XLA_FLAGS="--xla_tpu_enable_latency_hiding_scheduler=false" python bench.py --no-nf4-b1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
