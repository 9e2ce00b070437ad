#!/bin/bash
# Round-5 sweep: TPU-measure the round-4 snapshot work (VERDICT r4 #1).
#   part A — adaptive single-frame rows, orient-init A/B, 128 & 1000 frames
#            (the round-3 #3 bar: 1000-frame adaptive >=250 fps at <=3.5 px)
#   part B — bench_sweep5.sh (pcg_block vs shipped pcg it40 on stage 2)
#   part C — 100k-frame long-video recipe re-run at current defaults
#            (VERDICT r4 #6)
# Usage: bash scripts/bench_sweep_r5.sh [logfile]
set -u
LOG=${1:-/root/repo/docs/measurements/bench_sweep_r5_20260820.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep-r5 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
if ! timeout 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TPU probe FAILED (tunnel down) — aborting sweep" | tee -a "$LOG"
    exit 1
fi

run() {
    local tag=$1; shift
    echo "--- $tag ($*) $(date -u +%T) ---" | tee -a "$LOG"
    timeout 1800 env "$@" python bench.py >>"$LOG" 2>&1
    echo "rc=$? for $tag" | tee -a "$LOG"
}

# part A: adaptive orient A/B
run adapt128-orient   BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1
run adapt128-noorient BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_ORIENT=0
run adapt1000-orient  BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128
run adapt1000-noorient BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128 BENCH_SINGLE_ORIENT=0

# part B: pcg_block stage-2 sweep (ship rule: beat shipped pcg it40 within
# the best+0.2 px budget)
bash scripts/bench_sweep5.sh "$LOG"

# part C: 100k-frame long-video recipe at current defaults
run 100k-recipe BENCH_FRAMES=100000 BENCH_CHUNK=67 BENCH_CG_ITERS=64

echo "=== sweep-r5 end $(date -u +%FT%TZ) ===" | tee -a "$LOG"
