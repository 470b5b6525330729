#!/bin/bash
# Round-5 chain G: corrected scheduler race (r5f's flag name was not a
# registered XLA flag and killed every subprocess at startup;
# --xla_disable_hlo_passes IS proto-backed and forwards through the
# axon compile helper). If disabling the latency-hiding scheduler
# equalizes fp32 and bf16x2, the b1 tax is proven to be LHS schedule
# quality — diagnostic even if not a fix.
cd /root/repo
L=/tmp/chain_r5g.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[abcdef].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,123))))
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

step x2_nolhs 5400 env XLA_FLAGS="--xla_disable_hlo_passes=latency-hiding-scheduler" python bench.py --scales-dtype bf16x2 --no-nf4-b1
step fp32_nolhs 5400 env XLA_FLAGS="--xla_disable_hlo_passes=latency-hiding-scheduler" python bench.py --no-nf4-b1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
