#!/bin/bash
# Round-5 chain H: the layout-pin counter-move. The bf16x2 b1 tax is
# an XLA layout-assignment cascade on the scan-carried KV cache
# (r5 trace diff); QT_PIN_CACHE_LAYOUT=1 constrains the carry to the
# natural layout inside the jitted generate. Race it under both
# storages: if bf16x2+pin recovers >=60 tok/s at 3.97 GiB, the
# footprint north star closes with a code-level fix.
cd /root/repo
L=/tmp/chain_r5h.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[abcdefg].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,127))))
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

# fast compile-error detection on tiny shapes first
step pin_smoke 1200 env QT_PIN_CACHE_LAYOUT=1 python bench.py --preset tiny --new-tokens 8 --iters 2 --max-seq 64 --no-nf4-b1
step x2_pin    5400 env QT_PIN_CACHE_LAYOUT=1 python bench.py --scales-dtype bf16x2 --no-nf4-b1
step fp32_pin  5400 env QT_PIN_CACHE_LAYOUT=1 python bench.py --no-nf4-b1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
