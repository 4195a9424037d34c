#!/bin/bash
# Round-4 measurement sequence (run ONLY when the axon tunnel is alive and
# NOTHING else — especially pytest — is running; one TPU process at a time).
# Usage: bash benchmarks/round4_measure.sh [logfile]
# Serializes: small-d kernel probes -> train-step A/Bs -> bench.py.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/round4_measure.log}"
run() {
  echo "=== $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# 1. attention kernel probes (SD1.5 level-0 d=40 and level-1 d=80)
run python benchmarks/attn_probe.py smalld0            # blocks 512/1024
run python benchmarks/attn_probe.py smalld0_256_1024
run python benchmarks/attn_probe.py smalld0_512_512
run python benchmarks/attn_probe.py smalld1
# 2. headline sampling A/B: XLA one-shot dispatch vs small-d kernel vs ToMe
run python benchmarks/northstar.py
run env DMTPU_SMALL_D=1 python benchmarks/northstar.py
run python benchmarks/northstar.py 16 0.5   # ToMe ratio 0.5
# 3. SD train-step A/B: stock flash vs small-d kernel vs attn-remat policy
run python benchmarks/train_probe.py sd16
run env DMTPU_SMALL_D=1 python benchmarks/train_probe.py sd16
run python benchmarks/train_probe.py sd16attn
run env DMTPU_SMALL_D=1 python benchmarks/train_probe.py sd16attn
# 3b. ToMe r=0.5 training (differentiable token merging; VERDICT #3 target)
run python benchmarks/train_probe.py sd16tome
run python benchmarks/train_probe.py sd16attntome
# 4. headline bench (deepcache/pfdiff/tome extras + regression guard)
run python bench.py
echo "DONE -> $LOG" | tee -a "$LOG"
