#!/bin/bash
# Sweep 4: stage-2 chunking (the 10k-frame convergence-tail fix) + fine
# cg_iters grid between the shipped it48 (1637 @ 1.22) and the
# out-of-budget it32 (1812 @ 1.56).
# Usage: bash scripts/bench_sweep4.sh [logfile]
set -u
LOG=${1:-/tmp/bench_sweep4.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep4 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
if ! timeout 60 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TPU probe FAILED (tunnel down) — aborting sweep" | tee -a "$LOG"
    exit 1
fi

run() {
    local tag=$1; shift
    echo "--- $tag ($*) $(date -u +%T) ---" | tee -a "$LOG"
    timeout 1800 env "$@" python bench.py >>"$LOG" 2>&1
    echo "rc=$? for $tag" | tee -a "$LOG"
}

# chunking at 10k frames (667 windows): does per-chunk exit recover the
# 1k-frame per-window time?
run frames10k-chunk67   BENCH_FRAMES=10000 BENCH_CHUNK=67
run frames10k-chunk134  BENCH_FRAMES=10000 BENCH_CHUNK=134
# chunking at the headline 1k workload (67 windows, 2 chunks of 34):
# smaller chunks may win even here if the iteration spread is wide
run chunk34             BENCH_CHUNK=34
# fine cg_iters grid (fused default): residual budget allows up to
# best+0.2 px ~= 1.41
run it44                BENCH_CG_ITERS=44
run it40                BENCH_CG_ITERS=40
echo "=== sweep4 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
