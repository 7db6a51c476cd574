#!/bin/bash
# Wait for the tunneled TPU backend to come back, then run the queued
# measurements (run_pending_tpu.sh). Probes in subprocesses so failed
# backend init is never cached in a process we keep. Gives up after
# ~10 h.
set -u
cd "$(dirname "$0")/.."
deadline=$(( $(date +%s) + 36000 ))
attempt=0
while true; do
  attempt=$((attempt + 1))
  if timeout 180 python -c 'import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))' \
      > /tmp/tpu_probe.log 2>&1; then
    echo "probe $attempt OK at $(date -u +%H:%M:%S)"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "backend still unavailable after 10 h; giving up"
    exit 1
  fi
  echo "probe $attempt failed at $(date -u +%H:%M:%S); retry in 120 s"
  sleep 120
done
# settle: one more probe to make sure it's stable, not a flap
sleep 30
if ! timeout 180 python -c 'import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))' \
    > /tmp/tpu_probe2.log 2>&1; then
  echo "second probe failed; looping again"
  exec bash "$0"
fi
echo "backend stable; running pending queue"
bash benchmarks/run_pending_tpu.sh
