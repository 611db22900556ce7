#!/bin/bash
# Run a list of TPU measurement commands sequentially, surviving the
# tunneled worker's crashes: wait (indefinitely) for device health before
# each attempt — unhealthy probes do NOT consume retries, so a multi-hour
# outage can't permanently skip jobs (round-4 lost its whole deck that
# way) — then retry a job until its output contains "frames/s" (max 6
# real attempts, 2 min between).
# Usage: tpu_queue.sh jobs.txt logfile   (one shell command per line)
cd /root/repo
jobs=$1; log=$2
while IFS= read -r job; do
  [ -z "$job" ] && continue
  echo "=== JOB: $job ===" >> "$log"
  for try in $(seq 1 6); do
    until timeout 90 python -c "
import faulthandler; faulthandler.dump_traceback_later(80, exit=True)
import jax, numpy as np, jax.numpy as jnp
np.asarray((jnp.ones((64,64))@jnp.ones((64,64))).sum()); print('OK')" 2>/dev/null | grep -q OK; do
      echo "$(date): TPU unhealthy, sleeping 480s" >> "$log"
      sleep 480
    done
    out=$(timeout 5400 bash -c "$job" 2>&1)
    echo "$out" | grep -v WARNING >> "$log"
    if echo "$out" | grep -q "frames/s"; then
      echo "=== OK (try $try) ===" >> "$log"
      break
    fi
    echo "=== job failed (try $try), retrying ===" >> "$log"
    sleep 120
  done
done < "$jobs"
echo "=== QUEUE DONE $(date) ===" >> "$log"
