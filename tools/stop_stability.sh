#!/bin/bash
# Cleanly stop the stability training run started by run_stability.sh
# (SIGTERM to the RECORDED pid — never pattern-matched). Quiescing the
# chip + CPU core this way before any measurement window is mandatory:
# round 3's driver bench/dryrun artifacts were nulled by a live run.
set -u
PIDFILE=/tmp/stab_train.pid
if [ ! -f "$PIDFILE" ]; then
  echo "no $PIDFILE — nothing to stop"
  exit 0
fi
PID="$(cat "$PIDFILE")"
if ! kill -0 "$PID" 2>/dev/null; then
  echo "pid $PID not running — already stopped"
  rm -f "$PIDFILE"
  exit 0
fi
kill -TERM "$PID"
echo "sent SIGTERM to $PID; waiting for exit..."
for _ in $(seq 1 60); do
  kill -0 "$PID" 2>/dev/null || { echo "stopped."; rm -f "$PIDFILE"; exit 0; }
  sleep 2
done
echo "still alive after 120 s; sending SIGKILL to the process group"
# The pidfile records the GNU `timeout` wrapper (run_stability.sh execs
# `timeout ... python train.py`). timeout setpgid()s itself, so killing
# only $PID would orphan train.py, which keeps contending for the chip —
# the exact failure this script exists to prevent. Kill the group.
kill -KILL -- "-$PID" 2>/dev/null || kill -KILL "$PID" 2>/dev/null || true
rm -f "$PIDFILE"
