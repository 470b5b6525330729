#!/bin/bash
# Round-5 chain C: the flash-attention dodge races.
# The r5 xprof diff localized the bf16x2 b1 tax to ~30 small per-layer
# XLA copies/reshapes in the scan body (fusion-boundary churn around
# the einsum attention's cache slices; the pair kernels themselves are
# neutral). The flash stacked kernel replaces those XLA slices with
# scalar-prefetch indexing — race whether it (a) dodges the packed-
# scales tax, (b) rescues int8 KV at 2k ctx (its einsum dequant is the
# same op class).
cd /root/repo
L=/tmp/chain_r5c.log
while ps -ef | grep -v grep | grep -q "[c]hain_r5[ab].sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,113))))
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

# (a) does flash dodge the packed-scales tax? control first
step bench_flash_fp32 5400 python bench.py --flash --no-nf4-b1
step bench_flash_x2   5400 python bench.py --flash --scales-dtype bf16x2 --no-nf4-b1
# (b) does flash-i8 rescue int8 KV at 2k ctx?
step bench_2k_flash_bf16 5400 python bench.py --max-seq 2048 --flash --no-nf4-b1
step bench_2k_flash_int8 5400 python bench.py --max-seq 2048 --flash --kv-dtype int8 --no-nf4-b1
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
