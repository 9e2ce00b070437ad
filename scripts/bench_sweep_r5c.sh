#!/bin/bash
# Round-5 sweep, part 3 — after the batched-init + phase-P + fused-default
# commits. Everything here runs the SAME code (the r5/r5b adaptive rows
# mixed pre/post batched-init host code; these are the clean A/Bs):
#   1. plain bench — the driver-visible config with the FUSED two-stage
#      as the headline (ship confirmation)
#   2. adaptive rows, 128 & 1000 frames, orient on/off (batched inits)
#   3. adaptive + temporal propagation rows (phase P) at 1000 frames
#   4. SMPLTPU_TIME_ADAPTIVE attribution of the 1000-frame orient row
#   5. rasterizer RP_ABLATE incremental ablation at both resolutions
#      (VERDICT r4 #3 — the 0.47+0.84+4.2 vs 3.9 ms reconciliation)
# Usage: bash scripts/bench_sweep_r5c.sh [logfile]
set -u
LOG=${1:-/root/repo/docs/measurements/bench_sweep_r5c_20260820.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep-r5c start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
if ! timeout 120 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TPU probe FAILED (tunnel down) — aborting sweep" | tee -a "$LOG"
    exit 1
fi

run() {
    local tag=$1; shift
    echo "--- $tag ($*) $(date -u +%T) ---" | tee -a "$LOG"
    timeout 2400 env "$@" python bench.py >>"$LOG" 2>&1
    echo "rc=$? for $tag" | tee -a "$LOG"
}

run plain-fused-headline X=1
run plain-fused-confirm  X=1

run adapt128-orient    BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1
run adapt128-noorient  BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_ORIENT=0
run adapt1000-orient   BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128
run adapt1000-noorient BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128 BENCH_SINGLE_ORIENT=0
run adapt1000-prop     BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128 BENCH_SINGLE_PROPAGATE=1
run adapt1000-prop-noorient BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128 BENCH_SINGLE_ORIENT=0 BENCH_SINGLE_PROPAGATE=1

echo "--- time-adaptive attribution (adapt1000-orient) $(date -u +%T) ---" | tee -a "$LOG"
timeout 2400 env SMPLTPU_TIME_ADAPTIVE=1 BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 \
    BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128 python bench.py >>"$LOG" 2>&1
echo "rc=$? for time-adaptive" | tee -a "$LOG"

echo "--- raster ablation (RP_ABLATE, 270x480 + 720x1280) $(date -u +%T) ---" | tee -a "$LOG"
timeout 2400 env RP_ABLATE=1 RP_FRAMES=50 python scripts/profile_raster.py >>"$LOG" 2>&1
echo "rc=$? for rp-ablate" | tee -a "$LOG"

echo "=== sweep-r5c end $(date -u +%FT%TZ) ===" | tee -a "$LOG"
