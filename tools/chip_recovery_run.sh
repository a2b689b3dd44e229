#!/bin/bash
# Unattended chip-recovery runner: poll the TPU; when it answers, run the
# full bench (its untimed gates fail loudly on any kernel regression).
# Logs to /tmp/bench_r5_auto.log.  Safe to leave running: probes are
# subprocesses under timeout; nothing is killed by pattern.
set -u
cd /root/repo
for i in $(seq 1 400); do
  if timeout 90 python3 -c "import jax,jax.numpy as jnp; print(int(jnp.sum(jnp.arange(8))))" >/dev/null 2>&1; then
    echo "chip up at $(date -u +%H:%M:%S); running bench" >> /tmp/bench_r5_auto.log
    timeout 2400 python bench.py >> /tmp/bench_r5_auto.log 2>&1
    echo "bench exit=$? at $(date -u +%H:%M:%S)" >> /tmp/bench_r5_auto.log
    exit 0
  fi
  echo "probe $i down at $(date -u +%H:%M:%S)" >> /tmp/bench_r5_auto.log
  sleep 120
done
