#!/bin/bash
# Self-re-arming axon-relay watcher (VERDICT r4 item 1 / weak 1).
#
# The round-4 watcher was a one-shot script in /tmp that died silently;
# this one is committed, loops forever, heartbeats to a committed log
# path so the artifact trail proves it ran, and re-arms after a failed
# or partial queue run (the queue itself is resumable/idempotent).
#
# Start (round start):
#   setsid nohup bash experiments/relay_watch.sh \
#       >> experiments/results/relay_watch.log 2>&1 &
#   echo $! > /tmp/relay_watch.pid
# Stop:  kill $(cat /tmp/relay_watch.pid)
#
# Behavior: probe 127.0.0.1:8082 every 60s. On answer, settle 120s, then
# re-probe (tunnel flaps on cold start); if still up, fire
# experiments/round5_tpu_queue.sh (which itself waits-with-backoff on a
# mid-run relay drop). On queue success, write the DONE marker and exit.
# On queue failure, log and re-arm. Heartbeat every 30 probes (~30 min).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-experiments/results/relay_watch.log}
DONE_MARKER=experiments/results/round5_queue_done
QUEUE=${QUEUE:-experiments/round5_tpu_queue.sh}

probe() {
  python3 - <<'EOF'
import socket, sys
s = socket.socket(); s.settimeout(5)
try:
    s.connect(("127.0.0.1", 8082))
except OSError:
    sys.exit(1)
EOF
}

say() { echo "[$(date -u +%Y-%m-%dT%H:%M:%SZ)] $*" | tee -a "$LOG"; }

say "watcher armed (pid $$); queue=$QUEUE"
n=0
while true; do
  if [ -f "$DONE_MARKER" ]; then
    say "done marker present — queue already completed; watcher exiting"
    exit 0
  fi
  if probe; then
    say "relay UP after $n probes — settling 120s"
    sleep 120
    if ! probe; then
      say "relay flapped during settle — re-arming"
      continue
    fi
    say "firing queue"
    bash "$QUEUE"
    rc=$?
    if [ $rc -eq 0 ]; then
      date -u +%Y-%m-%dT%H:%M:%SZ > "$DONE_MARKER"
      say "queue complete (rc=0) — watcher exiting"
      exit 0
    fi
    say "queue rc=$rc — re-arming in 300s"
    sleep 300
  else
    n=$((n + 1))
    if [ $((n % 30)) -eq 0 ]; then
      say "heartbeat: relay still down after $n probes"
    fi
    sleep 60
  fi
done
