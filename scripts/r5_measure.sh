#!/bin/bash
# Round-5 TPU measurement session (run when the chip is free).
# Produces /tmp/r5_measure.log; each section prints one JSON/check line.
set -u
cd "$(dirname "$0")/.."
log() { echo "=== $* ==="; }

log "tpu_checks (solver precision + pair partition + joints-flat, compiled)"
timeout 1200 python scripts/tpu_checks.py

log "headline N=2 (dual-cap + flat joints)"
timeout 1800 python bench.py
log "headline N=2, flat joints OFF (A/B)"
MCR_JOINTS_FLAT=0 timeout 1800 python bench.py
log "N=1"
MCR_BENCH_AGENTS=1 timeout 1800 python bench.py
log "N=1, flat OFF"
MCR_BENCH_AGENTS=1 MCR_JOINTS_FLAT=0 timeout 1800 python bench.py

log "N=4 pair partition DEFAULT (pair_cap=E/2, coupled=E/16)"
MCR_BENCH_AGENTS=4 timeout 1800 python bench.py
log "N=4 pair cap sweep"
for PC in 1024 1536 3072; do
  echo "--- MCR_PAIR_CAP=$PC"
  MCR_BENCH_AGENTS=4 MCR_PAIR_CAP=$PC timeout 1800 python bench.py
done
log "N=4 coupled cap 512"
MCR_BENCH_AGENTS=4 MCR_COUPLED_CAP=512 timeout 1800 python bench.py
log "N=4 env-level partition only (round-4 baseline config)"
MCR_BENCH_AGENTS=4 MCR_PAIR_CAP=0 MCR_PARTITION_CAP=2048 timeout 1800 python bench.py
log "N=3 pair partition DEFAULT"
MCR_BENCH_AGENTS=3 timeout 1800 python bench.py

log "policy2 (trained-policy pack traffic; dual-cap default)"
timeout 2400 python scripts/bench_extras.py policy2
log "satbench"
timeout 1800 python scripts/bench_extras.py satbench
log "goldentpu (compiled rasterizer vs committed goldens)"
timeout 1800 python scripts/bench_extras.py goldentpu
log "ALL DONE"
