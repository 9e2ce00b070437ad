#!/bin/bash
# TPU bench sweep: measure the pending ROADMAP variants in one serialized run.
# Usage: bash scripts/bench_sweep.sh [logfile]
# Probes the tunnel first (60 s) so a dead TPU fails fast instead of hanging.
set -u
LOG=${1:-/tmp/bench_sweep.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
if ! timeout 60 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TPU probe FAILED (tunnel down) — aborting sweep" | tee -a "$LOG"
    exit 1
fi

run() {
    local tag=$1; shift
    echo "--- $tag ($*) $(date -u +%T) ---" | tee -a "$LOG"
    timeout 1200 env "$@" python bench.py >>"$LOG" 2>&1
    echo "rc=$? for $tag" | tee -a "$LOG"
}

run baseline-pcg        BENCH_LINEAR=pcg
run pcg-fused           BENCH_LINEAR=pcg BENCH_FUSED=1
run pcg-kernel          BENCH_LINEAR=pcg_kernel
run pcg-kernel-fused    BENCH_LINEAR=pcg_kernel BENCH_FUSED=1
run pcg-it48            BENCH_LINEAR=pcg BENCH_CG_ITERS=48
run pcg-it32            BENCH_LINEAR=pcg BENCH_CG_ITERS=32
run pcg-rtol3           BENCH_LINEAR=pcg BENCH_CG_RTOL=1e-3
run pcg-rtol2           BENCH_LINEAR=pcg BENCH_CG_RTOL=1e-2
run pcgkern-rtol3       BENCH_LINEAR=pcg_kernel BENCH_CG_RTOL=1e-3
run render-everything   BENCH_LINEAR=pcg BENCH_RENDER=1
run stream-latency      BENCH_LINEAR=pcg BENCH_STREAM=1
# scaling headroom: 10x the headline workload on the same chip (one
# bigger vmapped window batch; fps should hold or improve as the fixed
# dispatch/compile overheads amortize)
run frames-10k          BENCH_LINEAR=pcg BENCH_FRAMES=10000
echo "=== sweep done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
