#!/bin/bash
# Round-5 sweep, part 2 (continuation — the first bench_sweep_r5.sh run was
# killed mid adapt1000-orient when the builder session ended; adapt128 rows
# are already in bench_sweep_r5_20260820.log with rc=0).
#   part A2 — 1000-frame adaptive rows, orient A/B (round-3 #3 bar:
#             >=250 fps at <=3.5 px)
#   part B  — bench_sweep5.sh (pcg_block vs shipped pcg it40 on stage 2)
#   part C  — 100k-frame long-video recipe re-run at current defaults
#   part D  — fused two-stage single-dispatch A/B (VERDICT r4 #8 stretch)
# Usage: bash scripts/bench_sweep_r5b.sh [logfile]
set -u
LOG=${1:-/root/repo/docs/measurements/bench_sweep_r5_20260820.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep-r5b start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
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

# part A2: 1000-frame adaptive rows (the interrupted runs)
run adapt1000-orient  BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128
run adapt1000-noorient BENCH_SINGLE=1 BENCH_SINGLE_ADAPTIVE=1 BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_CHUNK=128 BENCH_SINGLE_ORIENT=0

# part D: fused two-stage single dispatch vs sequential (same invocation
# measures both, so the A/B shares one tunnel session)
run fuse-stages BENCH_FUSE_STAGES=1

# part B: pcg_block stage-2 sweep
bash scripts/bench_sweep5.sh "$LOG"

# part C: 100k-frame long-video recipe at current defaults
run 100k-recipe BENCH_FRAMES=100000 BENCH_CHUNK=67 BENCH_CG_ITERS=64

echo "=== sweep-r5b end $(date -u +%FT%TZ) ===" | tee -a "$LOG"
