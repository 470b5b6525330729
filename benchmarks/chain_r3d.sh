#!/bin/bash
# Round-3 session-b chain D: step decomposition + grid-tile DMA race +
# full fused bench table + long-context int8-KV capture.
cd /root/repo
L=/tmp/chain_r3d.log
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,89))))
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

step decode_prof_fuse 3600 python benchmarks/decode_profile.py --fuse
step dma_probe        3600 python benchmarks/pair_dma_pipeline_probe.py
step bench_full       4800 python bench.py --batch-sweep --prefill --max-seq 1024
step bench_2k_int8    4800 python bench.py --max-seq 2048 --prompt-len 1984 --kv-dtype int8
step bench_2k_bf16    4800 python bench.py --max-seq 2048 --prompt-len 1984
step paged_sweep2     5400 python benchmarks/paged_sweep_probe.py
step engine_paged_spd8 5400 python benchmarks/engine_probe.py --engine paged --steps-per-dispatch 8
step proxy_evals      5400 python -m quantizations_tpu.evals --proxy --preset 8b --parity
step prefill_probe2   5400 python benchmarks/prefill_probe.py 512 2048
echo "=== CHAIN D DONE ($(date +%H:%M:%S)) ===" >>"$L"
