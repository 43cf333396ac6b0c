#!/bin/bash
# Run a python script on the (single-claim, tunneled) TPU with wedge
# detection: if the process produces no CPU time growth within the probe
# window (stuck in the backend-claim handshake), kill and relaunch.
# Usage: tpu_run.sh <logfile> <python-args...>
LOG=$1; shift
for attempt in 1 2 3 4 5 6; do
  python "$@" > "$LOG" 2>&1 &
  PID=$!
  sleep 100
  CPU=$(ps -o cputimes= -p $PID 2>/dev/null | tr -d ' ')
  if [ -z "$CPU" ]; then
    wait $PID; exit $?            # finished quickly
  fi
  if [ "$CPU" -ge 8 ]; then
    wait $PID; exit $?            # making progress
  fi
  echo "[tpu_run] attempt $attempt wedged (cpu=${CPU}s), retrying" >> "$LOG"
  kill $PID 2>/dev/null; sleep 3
  kill -9 $PID 2>/dev/null
  sleep 45
done
echo "[tpu_run] giving up" >> "$LOG"; exit 1
