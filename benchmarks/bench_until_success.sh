#!/bin/bash
# Retry `python bench.py` until a non-cached result lands (TPU healthy),
# then stop. Logs to /tmp/bench_retry.log.
cd /root/repo
log=/tmp/bench_retry.log
echo "retry loop start $(date)" >> $log
for i in $(seq 1 40); do
  # quick health probe first so we don't burn 20 min on a wedged worker
  if ! timeout 90 python -c "
import faulthandler; faulthandler.dump_traceback_later(80, exit=True)
import jax, numpy as np, jax.numpy as jnp
np.asarray((jnp.ones((64,64))@jnp.ones((64,64))).sum()); print('OK')" 2>/dev/null | grep -q OK; then
    echo "$(date): TPU not healthy, sleeping" >> $log
    sleep 300
    continue
  fi
  echo "$(date): TPU healthy, running bench" >> $log
  out=$(python bench.py 2>>$log)
  echo "$out" >> $log
  if [ -n "$out" ] && ! echo "$out" | grep -q '"cached"'; then
    echo "SUCCESS $(date)" >> $log
    exit 0
  fi
  sleep 120
done
echo "retry loop gave up $(date)" >> $log
