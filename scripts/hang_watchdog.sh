#!/bin/bash
# Detect a job hung on a dead TPU tunnel and kick it only when the tunnel
# is back: if the job's log hasn't grown for STALE_S seconds AND a tiny
# device probe succeeds, kill the exact job PID (its supervisor relaunch
# loop resumes the chain from completed artifacts). While the tunnel is
# down the probe fails and we just wait — killing would only create a new
# process that hangs at backend init.
#
# usage: hang_watchdog.sh <logfile> <pid | parent:SUPERVISOR_PID> [stale_s]
#
# Numeric pid: watch that exact process; exit after it dies or is killed.
# parent:PID : watch the supervisor's current child (resolved by exact
#              parent pid each cycle — never by name/pattern), surviving
#              supervisor relaunches; exit when the supervisor exits.
set -u
LOG=$1
TARGET=$2
STALE_S=${3:-600}

resolve_pid() {
  case "$TARGET" in
    parent:*) pgrep -P "${TARGET#parent:}" 2>/dev/null | head -1 ;;
    *) echo "$TARGET" ;;
  esac
}

while :; do
  JOB_PID=$(resolve_pid)
  if [ -z "$JOB_PID" ] || ! kill -0 "$JOB_PID" 2>/dev/null; then
    case "$TARGET" in
      parent:*)
        kill -0 "${TARGET#parent:}" 2>/dev/null || exit 0
        sleep 30
        continue ;;
      *) exit 0 ;;
    esac
  fi
  sleep 60
  now=$(date +%s)
  mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
  if [ $((now - mt)) -lt "$STALE_S" ]; then
    continue
  fi
  echo "$(date -Is) log stale $((now - mt))s; probing tunnel" >&2
  if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "$(date -Is) tunnel healthy but job stale -> killing $JOB_PID" >&2
    kill "$JOB_PID" 2>/dev/null
    sleep 10
    kill -9 "$JOB_PID" 2>/dev/null
    case "$TARGET" in
      parent:*) continue ;;
      *) exit 0 ;;
    esac
  else
    echo "$(date -Is) tunnel down; waiting" >&2
  fi
done
