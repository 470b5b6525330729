#!/bin/bash
# Round-5 chain E: last bf16x2 dice-rolls. The b1 tax is scheduler-
# level (same named XLA copies run ~60% slower in the bf16x2 scan
# body; kernels neutral, attention-impl-independent — r5c refuted the
# flash dodge). Different program structures reshuffle the schedule:
# race the manual-DMA pair pipeline and the unfused form under
# bf16x2. Any config at >=60 tok/s with 3.97 GiB closes the footprint
# north star; all losses = the refutation is complete.
cd /root/repo
L=/tmp/chain_r5e.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[abcd].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,119))))
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

step bench_x2_manual 5400 python bench.py --scales-dtype bf16x2 --pipeline manual --no-nf4-b1
step bench_x2_nofuse 5400 python bench.py --scales-dtype bf16x2 --no-fuse --no-nf4-b1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
