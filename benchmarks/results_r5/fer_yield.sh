#!/bin/bash
# Pause the background CPU FER run (exact PID) whenever the TPU queue is
# actively executing a job, so host-loop dispatch timing is never
# distorted by CPU contention; resume it while the queue is just
# sleeping/probing.  Usage: fer_yield.sh <fer_pid> <queue_pid>
fer=$1; queue=$2
state=run
while kill -0 "$fer" 2>/dev/null; do
  # a busy queue has a non-sleep child (the job's bash/python)
  busy=0
  for c in $(ps -o pid= --ppid "$queue" 2>/dev/null); do
    cmd=$(ps -o comm= -p "$c" 2>/dev/null)
    if [ "$cmd" != "sleep" ]; then busy=1; fi
  done
  if [ "$busy" = 1 ] && [ "$state" = run ]; then
    kill -STOP "$fer"; state=stop
  elif [ "$busy" = 0 ] && [ "$state" = stop ]; then
    kill -CONT "$fer"; state=run
  fi
  sleep 15
done
