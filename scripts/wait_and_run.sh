#!/usr/bin/env bash
# Poll a PID until it exits, then launch a training command
# (reference: wait_and_run.sh — simple job-queueing hack, kept for parity).
# Usage: scripts/wait_and_run.sh <pid> <command...>
set -euo pipefail
PID=$1; shift
echo "waiting for pid $PID to exit..."
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "pid $PID gone; launching: $*"
exec "$@"
