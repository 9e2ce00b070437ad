#!/bin/bash
# Round-4 sweep: fit-level block-inverse PCG preconditioner (pcg_block,
# VERDICT r3 #8) vs the shipped truncated Jacobi-PCG on the warm-started
# stage-2 (the only context where the init-linearization preconditioner
# is NOT stale — cold-init rigs measured it equal-or-worse than Jacobi,
# tests/test_multi_frame.py::test_pcg_block_matches_exact_solver).
# Ship rule: beat the shipped default within the best+0.2 px budget.
# Usage: bash scripts/bench_sweep5.sh [logfile]
set -u
LOG=${1:-/tmp/bench_sweep5.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep5 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
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

run baseline-pcg40      BENCH_LINEAR=pcg BENCH_FUSED=1 BENCH_CG_ITERS=40
run blk-it40            BENCH_LINEAR=pcg_block BENCH_FUSED=1 BENCH_CG_ITERS=40
run blk-it24            BENCH_LINEAR=pcg_block BENCH_FUSED=1 BENCH_CG_ITERS=24
run blk-it16            BENCH_LINEAR=pcg_block BENCH_FUSED=1 BENCH_CG_ITERS=16
run blk-it12            BENCH_LINEAR=pcg_block BENCH_FUSED=1 BENCH_CG_ITERS=12
run blk-it8             BENCH_LINEAR=pcg_block BENCH_FUSED=1 BENCH_CG_ITERS=8
echo "=== sweep5 end $(date -u +%FT%TZ) ===" | tee -a "$LOG"
