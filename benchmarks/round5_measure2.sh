#!/bin/bash
# Round-5 measurement continuation (the first run died with the session after
# mmditb32nradamw). Same rules as round5_measure.sh: one TPU process at a time.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/round5_measure2.log}"
run() {
  echo "=== $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

run python benchmarks/train_probe.py mmditb32nrnoqk

# MMDiT-L/2 on one 16 GB chip (VERDICT r4 #1b): bf16 torso params halve
# params+grads HBM; adafactor states are factored f32 (tiny).
run python benchmarks/train_probe.py mmditl8bf16p
run python benchmarks/train_probe.py mmditl16bf16p
run python benchmarks/train_probe.py mmditl32bf16p
run python benchmarks/train_probe.py mmditl32bf16pattn

echo "DONE -> $LOG" | tee -a "$LOG"
touch /tmp/round5_measure2_done
