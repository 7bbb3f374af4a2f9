#!/bin/bash
# Wait for the axon tunnel to recover, then run the full TPU session.
# Retries across wedges (tpu_session exits 3 via its progress watchdog and
# resumes from artifacts/runs/ on the next attempt).  Probes are spaced
# far apart because a probe of a wedged tunnel is itself a killed client.
cd "$(dirname "$0")/.." || exit 1
BACKOFF=${BACKOFF:-900}
while true; do
  if python -u scripts/probe_tpu.py 120; then
    echo "[tpu_watch] tunnel healthy -> running session"
    # stop the CPU fallback session (if one is running) so the two never
    # write the same artifacts/runs files; PID recorded by cpu_quality.py
    if [ -f artifacts/cpu_quality.pid ]; then
      pid=$(cat artifacts/cpu_quality.pid)
      # only kill if the PID is still the cpu_quality process (a stale pid
      # file after PID reuse must never take down an unrelated process)
      if [ -n "$pid" ] && grep -q "cpu_quality" "/proc/$pid/cmdline" 2>/dev/null; then
        kill "$pid" 2>/dev/null
        sleep 5
      fi
      rm -f artifacts/cpu_quality.pid
    fi
    python -u scripts/tpu_session.py
    rc=$?
    if [ $rc -eq 0 ]; then
      echo "[tpu_watch] session complete"
      exit 0
    fi
    echo "[tpu_watch] session exited rc=$rc; backing off ${BACKOFF}s"
  else
    echo "[tpu_watch] tunnel wedged ($(date +%H:%M:%S)); backing off ${BACKOFF}s"
  fi
  sleep "$BACKOFF"
done
