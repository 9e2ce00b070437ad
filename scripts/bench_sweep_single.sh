#!/bin/bash
# Single-frame sweep (VERDICT round-3 item 1): the 3dba_single path under
# the shipped exact-TR default has NO TPU number since the round-2 solver
# change (round-1's 344 fps was the old damped solver). Measure eigh vs
# the Cholesky-Newton More-Sorensen (tr_solver=chol) vs dogleg, plus the
# --use-gmm and --multi-start sub-variants at the winner.
# Usage: bash scripts/bench_sweep_single.sh [logfile]
set -u
LOG=${1:-/tmp/bench_sweep_single.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== sweep-single start $(date -u +%FT%TZ) ===" | tee -a "$LOG"
if ! timeout 60 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "TPU probe FAILED (tunnel down) — aborting sweep" | tee -a "$LOG"
    exit 1
fi

run() {
    local tag=$1; shift
    echo "--- $tag ($*) $(date -u +%T) ---" | tee -a "$LOG"
    timeout 1800 env BENCH_SINGLE=1 "$@" python bench.py >>"$LOG" 2>&1
    echo "rc=$? for $tag" | tee -a "$LOG"
}

# TR subproblem solver A/B at the shipped defaults (128 frames x 100 it)
run single-eigh     BENCH_SINGLE_TR=eigh
run single-chol     BENCH_SINGLE_TR=chol
run single-dogleg   BENCH_SINGLE_TR=dogleg
# sub-variants (run at both eigh and chol until a default is picked)
run single-gmm-eigh       BENCH_SINGLE_GMM=1 BENCH_SINGLE_TR=eigh
run single-gmm-chol       BENCH_SINGLE_GMM=1 BENCH_SINGLE_TR=chol
run single-multistart-chol BENCH_SINGLE_MULTISTART=1 BENCH_SINGLE_TR=chol
# width scaling: does the batch fill the chip?
run single-1000-chol BENCH_SINGLE_FRAMES=1000 BENCH_SINGLE_TR=chol
echo "=== sweep-single done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
