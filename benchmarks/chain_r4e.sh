#!/bin/bash
# Round-4 chain E: fusion x scale-dtype discriminators for the bf16
# scales e2e tax (step-level showed bf16 FASTER; find where the bench
# config loses it). Queues behind chain D.
cd /root/repo
L=/tmp/chain_r4e.log
while ps -ef | grep -v grep | grep -q "[c]hain_r4d.sh"; do
  sleep 60
done
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,103))))
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

step tax_fuse_step 4800 python benchmarks/scales_tax_probe.py --fuse
step tax_gen_fused 6000 python benchmarks/scales_tax_probe.py --generate --fuse --layers 32 --batch 1
step tax_gen_plain 6000 python benchmarks/scales_tax_probe.py --generate --layers 32 --batch 1
step bench_sc_nofuse 4800 python bench.py --lean-scales --no-fuse --no-lean-embed
step ilp_rates    3600 python benchmarks/pair_decode_probe3.py ilp
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
