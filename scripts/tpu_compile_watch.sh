#!/bin/bash
# Poll the axon tunnel's COMPILE path (the execute path can be healthy
# while novel-program compilation stalls — seen 2026-08-20 ~22:00) and
# launch the given command once two consecutive probes pass.
# Usage: bash scripts/tpu_compile_watch.sh <command...>
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
ok=0
while true; do
    c=$RANDOM.$RANDOM
    if timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (jnp.sin(a) * $c).sum())(jnp.ones((17, 23)))))
" >/dev/null 2>&1; then
        ok=$((ok + 1))
        echo "$(date -u +%T) compile probe OK ($ok/2)"
        if [ "$ok" -ge 2 ]; then break; fi
        sleep 30
    else
        ok=0
        echo "$(date -u +%T) compile probe STALLED; retry in 180s"
        sleep 180
    fi
done
echo "$(date -u +%T) compile path healthy — launching: $*"
exec "$@"
