#!/bin/bash
# Round-5 measurement sequence (run ONLY when the axon tunnel is alive and no
# other TPU process — the tunnel is single-user; CPU-pinned pytest is fine if
# launched with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu).
# Usage: bash benchmarks/round5_measure.sh [logfile]
# Order: most-informative first so a tunnel drop still leaves usable data.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/round5_measure.log}"
run() {
  echo "=== $* [$(date +%H:%M:%S)]" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? [$(date +%H:%M:%S)]" | tee -a "$LOG"
}

# 1. ToMe x flash_small_d composition (VERDICT r4 #4: target >=30 img/s).
#    Round-4's ToMe rows predate the small-d training default; re-measure at
#    HEAD where the dispatch flip routes merged S=2048 (d=40) / S=1024 (d=80)
#    through the fused kernel.
run python benchmarks/train_probe.py sd16tome
run python benchmarks/train_probe.py sd16attntome

# 2. MMDiT-B/2 MFU decomposition (VERDICT r4 #1a): batch scaling, joint-seq
#    lane alignment (ctx 77 -> 128 => S=384), optimizer, qk-norm islands.
run python benchmarks/train_probe.py mmditb64nr
run python benchmarks/train_probe.py mmditb128nr
run python benchmarks/train_probe.py mmditb32nrctx128
run python benchmarks/train_probe.py mmditb32nradamw
run python benchmarks/train_probe.py mmditb32nrnoqk

# 3. MMDiT-L/2 on one 16 GB chip (VERDICT r4 #1b): bf16 torso params halve
#    params+grads HBM; adafactor states are factored f32 (tiny).
run python benchmarks/train_probe.py mmditl8bf16p
run python benchmarks/train_probe.py mmditl16bf16p
run python benchmarks/train_probe.py mmditl32bf16p
run python benchmarks/train_probe.py mmditl32bf16pattn

echo "DONE -> $LOG" | tee -a "$LOG"
touch /tmp/round5_measure_done
