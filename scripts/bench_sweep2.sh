#!/bin/bash
# Follow-up TPU sweep (round 2, after the 2026-08-18 measurements):
# the Mosaic-fixed pcg_kernel, fused_cost combos, and the re-scoped
# 10k-frame run (triangle-folded motion phase). Serialized; 1-CPU box.
set -u
LOG=${1:-/tmp/bench_sweep2.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep2 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
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

run pcg-kernel          BENCH_LINEAR=pcg_kernel
run pcg-kernel-fused    BENCH_LINEAR=pcg_kernel BENCH_FUSED=1
run pcgkern-fused-it32  BENCH_LINEAR=pcg_kernel BENCH_FUSED=1 BENCH_CG_ITERS=32
run pcg-fused-it48      BENCH_LINEAR=pcg BENCH_FUSED=1 BENCH_CG_ITERS=48
run pcg-fused-it32      BENCH_LINEAR=pcg BENCH_FUSED=1 BENCH_CG_ITERS=32
run frames-10k          BENCH_LINEAR=pcg BENCH_FUSED=1 BENCH_FRAMES=10000
echo "=== sweep2 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
