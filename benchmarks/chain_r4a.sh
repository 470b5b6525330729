#!/bin/bash
# Round-4 chain A: decode-ceiling decision data (VERDICT r3 asks #1/#2/#10).
# 1. on-chip numerics validation (standing first step, ask #10)
# 2. VPU dtype op-rate table  -> decides if 16-bit-native decode can win
# 3. pure decode rates        -> strategy-level decode cost, no MXU
# 4. fused kernel race        -> s16 / tree16 vs incumbents, bit-identity
# Backend-wait preamble so outages don't eat step budgets.
cd /root/repo
L=/tmp/chain_r4a.log
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,93))))
print('BACKEND_OK')" 2>/dev/null | grep -q BACKEND_OK
}
waitb() {
  for i in $(seq 1 80); do
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

step onchip_valid 1800 python benchmarks/onchip_validation.py
step vpu_rates    4200 python benchmarks/pair_decode_probe3.py rates
step decode_rates 3000 python benchmarks/pair_decode_probe3.py decode
step kernel_race  3600 python benchmarks/pair_decode_probe3.py kernel
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
