#!/bin/bash
# Round-3 session-b serial TPU measurement chain (one chip, serialized).
# Everything logs to /tmp/chain_r3b.log; each step has its own timeout.
# Order = value density: NF4 kernel race -> FP4 headline -> NF4 e2e ->
# engine aggregate -> prefill MFU -> paged sweep -> 8B proxy parity.
cd /root/repo
L=/tmp/chain_r3b.log
step() {  # step <name> <timeout_s> <cmd...>
  echo "=== STEP $1 ($(date +%H:%M:%S)) ===" >>"$L"
  shift; t=$1; shift
  timeout "$t" "$@" >>"$L" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >>"$L"
}

step nf4_race      2400 python benchmarks/nf4_mechanism_probe.py mix_gt mix_g02bt
step fp4_fuse      3600 python bench.py --fuse
step fp4_fuse_mixg02 3600 python bench.py --fuse --fp4-decode mixg02
step nf4_mixbt     3600 python bench.py --quant-type nf4 --nf4-decode mix_bt
step nf4_mix       3600 python bench.py --quant-type nf4
step engine_spd8   5400 python benchmarks/engine_probe.py --steps-per-dispatch 8
step engine_spec8  3600 python benchmarks/engine_probe.py --spec-k 8
step prefill_probe 5400 python benchmarks/prefill_probe.py 512 2048
step paged_sweep   5400 python benchmarks/paged_sweep_probe.py
step engine_paged  5400 python benchmarks/engine_probe.py --engine paged --steps-per-dispatch 4 --spec-k 4
step proxy_evals   5400 python -m quantizations_tpu.evals --proxy --preset 8b --parity
echo "=== CHAIN DONE ($(date +%H:%M:%S)) ===" >>"$L"
