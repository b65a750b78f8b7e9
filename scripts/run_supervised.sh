#!/bin/bash
# Supervise a resumable long-running python job: if it exits nonzero
# (e.g. the TPU tunnel drops) and its done-file is absent, relaunch it.
# All spliced_northstar/quickrun phases skip work that already exists,
# so a relaunch resumes from the last completed artifact.
#
# usage: run_supervised.sh <done_file> <logfile> <cmd...>
set -u
# tunneled-TPU client: bound the replay journal (else ~94MB leaks per
# dispatch and dispatch slows as the journal grows); must be in the env
# BEFORE python starts (the plugin registers via sitecustomize)
export AXON_JOURNAL_COMPACT=${AXON_JOURNAL_COMPACT:-1}
DONE_FILE=$1; shift
LOG=$1; shift
# The attempt cap guards against a hard failure loop (crash on the same
# line every relaunch), NOT against long outages: an attempt that made
# progress (the log grew) resets the budget, so a flaky tunnel can drop
# any number of times as long as the chain keeps advancing.
ATTEMPT=0
while [ ! -e "$DONE_FILE" ] && [ $ATTEMPT -lt 20 ]; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "=== supervisor attempt $ATTEMPT: $* ===" >> "$LOG"
  size0=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== supervisor: clean exit ===" >> "$LOG"
    break
  fi
  size1=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  if [ $((size1 - size0)) -gt 500 ]; then
    ATTEMPT=0  # made progress: this wasn't a deterministic crash loop
  fi
  echo "=== supervisor: exit $rc, retrying in 60s ===" >> "$LOG"
  sleep 60
done
