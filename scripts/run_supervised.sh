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
# line every relaunch), NOT against long outages: an attempt that ran
# for >=10 minutes was doing real work (a deterministic resume-and-crash
# loop dies in seconds — even a killed-by-watchdog hang burns its budget
# slowly), so it resets the budget and a flaky tunnel can drop any
# number of times as long as the chain keeps advancing.
ATTEMPT=0
while [ ! -e "$DONE_FILE" ] && [ $ATTEMPT -lt 20 ]; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "=== supervisor attempt $ATTEMPT: $* ===" >> "$LOG"
  t0=$SECONDS
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== supervisor: clean exit ===" >> "$LOG"
    break
  fi
  if [ $((SECONDS - t0)) -ge 600 ]; then
    ATTEMPT=0  # long-running attempt: not a deterministic crash loop
  fi
  echo "=== supervisor: exit $rc, retrying in 60s ===" >> "$LOG"
  sleep 60
done
