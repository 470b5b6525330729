#!/bin/bash
# Round-5 chain J: race the NEW decode-once prefill pair kernel
# (QT_PREFILL_PAIR=1) against the dense dequant-materialization path.
# Unlike chain_r5i (which re-raced the DECODE-band pair kernels at
# prefill shapes and lost 253 vs 142-156 ms), this kernel grids over
# (M, K) only, holds the full activation resident, decodes each weight
# tile ONCE and loops T in-kernel — interpret-validated bit-compatible,
# packed-scales-ready. Baselines: dense T=512 B=1 142-156 ms / B=8
# 889 ms / T=2048 452-458 ms.
cd /root/repo
L=/tmp/chain_r5j.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[a-i].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,131))))
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

step prefill_new 7200 env QT_PREFILL_PAIR=1 python benchmarks/prefill_e2e.py --cases 512x1,512x8,2048x1
step prefill_new_share 5400 env QT_PREFILL_PAIR=1 python benchmarks/prefill_share_probe.py --cases 512x1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
