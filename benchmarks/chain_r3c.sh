#!/bin/bash
# Round-3 session-b chain C: re-prioritized after chain_r3b's partial run
# (mix_bt settled: LOSES; fp4 mixg02 settled: LOSES e2e; fp4 fused 60.9).
# New: fp4 arith_sr (mul-free blend), nf4 mix_g3 (3-gather rebalance).
# A backend-wait preamble keeps outage time from eating step budgets.
cd /root/repo
L=/tmp/chain_r3c.log
probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda a: a*2+5)(jnp.ones((8,91))))
print('BACKEND_OK')" 2>/dev/null | grep -q BACKEND_OK
}
waitb() {  # poll until the backend answers (bounded 2h)
  for i in $(seq 1 80); do
    probe && return 0
    echo "# backend down, poll $i ($(date +%H:%M:%S))" >>"$L"
    sleep 90
  done
  return 1
}
step() {  # step <name> <timeout_s> <cmd...>
  waitb || { echo "=== BACKEND NEVER CAME BACK, stopping ===" >>"$L"; exit 1; }
  echo "=== STEP $1 ($(date +%H:%M:%S)) ===" >>"$L"
  shift; t=$1; shift
  timeout "$t" "$@" >>"$L" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >>"$L"
}

step nf4_mix       3600 python bench.py --quant-type nf4
step fp4_golf      2400 python benchmarks/pair_decode_probe2.py v2 v2b v2c
step fp4_arith_sr  3600 python bench.py --fuse --fp4-decode arith_sr
step nf4_mix_g3    3600 python bench.py --quant-type nf4 --nf4-decode mix_g3
step decode_prof   3600 python benchmarks/decode_profile.py
step engine_spd8   5400 python benchmarks/engine_probe.py --steps-per-dispatch 8
step engine_spec8  3600 python benchmarks/engine_probe.py --spec-k 8
step prefill_probe 5400 python benchmarks/prefill_probe.py 512 2048
step paged_sweep   5400 python benchmarks/paged_sweep_probe.py
step engine_paged  5400 python benchmarks/engine_probe.py --engine paged --steps-per-dispatch 4 --spec-k 4
step proxy_evals   5400 python -m quantizations_tpu.evals --proxy --preset 8b --parity
echo "=== CHAIN C DONE ($(date +%H:%M:%S)) ===" >>"$L"
