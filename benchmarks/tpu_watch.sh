#!/bin/bash
# Probe the tunneled TPU every 5 min; when it answers, run bench.py once
# and a flagship timing probe, logging to /tmp/tpu_watch.log.
cd /root/repo
log=/tmp/tpu_watch.log
echo "watch start $(date)" >> $log
for i in $(seq 1 72); do
  if timeout 60 python -c "
import faulthandler; faulthandler.dump_traceback_later(50, exit=True)
import jax, numpy as np, jax.numpy as jnp
np.asarray((jnp.ones((64,64))@jnp.ones((64,64))).sum())
print('OK')" 2>/dev/null | grep -q OK; then
    echo "TPU back at $(date)" >> $log
    echo "=== bench.py ===" >> $log
    timeout 1400 python bench.py >> $log 2>&1
    echo "=== flagship probe ===" >> $log
    timeout 1200 python benchmarks/flagship_probe.py >> $log 2>&1
    echo "watch done $(date)" >> $log
    exit 0
  fi
  sleep 290
done
echo "watch gave up $(date)" >> $log
