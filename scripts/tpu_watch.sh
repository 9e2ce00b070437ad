#!/bin/bash
# Probe the axon TPU tunnel every 10 min; when it answers, run the bench
# sweep (scripts/bench_sweep.sh) once and exit. Designed to sit in a tmux
# session during tunnel outages (see .claude/skills/verify/SKILL.md).
set -u
LOG=${1:-/tmp/tpu_watch.log}
SWEEPLOG=${2:-/tmp/bench_sweep.log}
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

while true; do
    echo "probe $(date -u +%FT%TZ)" >> "$LOG"
    if timeout -k 10 60 python -c "import jax; d=jax.devices(); import jax.numpy as jnp; (jnp.ones((2,2))@jnp.ones((2,2))).block_until_ready(); print(d)" >> "$LOG" 2>&1; then
        echo "TPU UP $(date -u +%FT%TZ) — starting sweep" >> "$LOG"
        bash scripts/bench_sweep.sh "$SWEEPLOG"
        echo "sweep finished rc=$? $(date -u +%FT%TZ)" >> "$LOG"
        exit 0
    fi
    sleep 600
done
