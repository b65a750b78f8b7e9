#!/bin/bash
# Detect a job hung on a dead TPU tunnel WITHOUT ever touching the
# device: the tunnel admits one client at a time, and a concurrent
# "health probe" process can reset the relay under the job's feet
# (observed as SIGSEGV mid-run).  Instead, a wedged client is identified
# by what it IS: hung on a futex burning zero CPU.  A healthy job that
# merely logs rarely (long device phases) keeps accumulating CPU time
# and is left alone no matter how stale its log is.
#
# Kill condition: log stale >= STALE_S  AND  the job's cumulative CPU
# time advanced < 2 jiffies over a 60 s window.  The exact PID is
# killed; the supervisor relaunch loop resumes the chain from completed
# artifacts.  If the tunnel is still down, the relaunched process hangs
# at backend init with zero CPU and is killed again harmlessly until
# the tunnel returns.
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

cpu_jiffies() {  # utime+stime of the whole process (all threads)
  awk '{print $14 + $15}' "/proc/$1/stat" 2>/dev/null || echo ""
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
  c0=$(cpu_jiffies "$JOB_PID")
  sleep 60
  c1=$(cpu_jiffies "$JOB_PID")
  if [ -z "$c0" ] || [ -z "$c1" ]; then
    continue  # process went away between samples; next cycle resolves
  fi
  if [ $((c1 - c0)) -ge 2 ]; then
    echo "$(date -Is) log stale $((now - mt))s but job busy" \
         "(+$((c1 - c0)) jiffies); leaving it alone" >&2
    continue
  fi
  echo "$(date -Is) log stale $((now - mt))s and job idle" \
       "(+$((c1 - c0)) jiffies) -> killing $JOB_PID" >&2
  kill "$JOB_PID" 2>/dev/null
  sleep 10
  kill -9 "$JOB_PID" 2>/dev/null
  case "$TARGET" in
    parent:*) continue ;;
    *) exit 0 ;;
  esac
done
