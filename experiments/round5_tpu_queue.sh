#!/bin/bash
# Round-5 TPU measurement queue — everything pending on the relay outage
# (VERDICT r4 items 1, 2-throughput, 4, 6). Unlike the round-4 queue this
# one WAITS with backoff when the relay is down (at entry or mid-run)
# instead of aborting, and records per-stage done markers so a re-armed
# watcher resumes instead of repeating finished stages.
#
#   bash experiments/round5_tpu_queue.sh [stage ...]   # default: all
#
# Stages: bench bank_f32 bank_bf16 ms_bf16 warm4m faithful1m gen_delta
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-experiments/results/round5_tpu_queue.log}
GAP=${GAP:-120}
MARKDIR=experiments/results
STAGES=${*:-"bench bank_f32 bank_bf16 ms_bf16 warm4m faithful1m gen_delta"}

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

wait_relay() {  # block until the relay answers; backoff 60s -> 600s
  local d=60
  while ! probe; do
    echo "[$(date -u +%H:%M:%S)] relay down — waiting ${d}s" | tee -a "$LOG"
    sleep "$d"
    d=$((d * 2)); [ "$d" -gt 600 ] && d=600
  done
}

run() {  # run <stage> <cmd...> — skip if done-marker exists, mark on rc=0
  local name=$1; shift
  if [ -f "$MARKDIR/round5_stage_$name.done" ]; then
    echo "=== $name already done — skipping ===" | tee -a "$LOG"
    return 0
  fi
  wait_relay
  echo "=== [$(date -u +%H:%M:%S)] $name ===" | tee -a "$LOG"
  timeout 5400 "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "=== [$(date -u +%H:%M:%S)] $name rc=$rc" | tee -a "$LOG"
  if [ $rc -eq 0 ]; then
    date -u +%Y-%m-%dT%H:%M:%SZ > "$MARKDIR/round5_stage_$name.done"
  fi
  sleep "$GAP"
  return $rc
}

overall=0
for s in $STAGES; do
  case $s in
    bench)       # re-capture the headline driver number on real TPU
      run bench python bench.py || overall=1 ;;
    bank_f32)    # f32 SeedBank K-curve (control arm)
      run bank_f32 python experiments/bank_scaling.py --dtype float32 \
        || overall=1 ;;
    bank_bf16)   # bf16 SeedBank K-curve (throughput half of bf16 story)
      run bank_bf16 python experiments/bank_scaling.py --dtype bfloat16 \
        || overall=1 ;;
    ms_bf16)     # n=30 bf16 quality arm — resumable; CPU run may have
                 # already filled all seeds, in which case this is a noop
      run ms_bf16 python experiments/ours_multiseed.py --bank \
          --dtype bfloat16 --models cvae_gan --modes balanced \
          --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 \
                  20 21 22 23 24 25 26 27 28 29 \
          --out experiments/results/ours_multiseed.jsonl || overall=1 ;;
    warm4m)      # cache-warm 4M pipeline, cold then warm
      run warm4m_cold python experiments/ours_scale_4m.py \
          --data /tmp/can_4m \
          --out experiments/results/ours_scale_4m_cold.json || overall=1
      run warm4m_warm python experiments/ours_scale_4m.py \
          --data /tmp/can_4m \
          --out experiments/results/ours_scale_4m_warm.json || overall=1 ;;
    faithful1m)  # 1M frames on the schema-faithful Car-Hacking stand-in
      run faithful1m python experiments/ours_scale_4m.py --faithful \
          --frames 1000000 --data /tmp/can1m_faithful \
          --out experiments/results/ours_scale_1m_faithful.json \
        || overall=1 ;;
    gen_delta)   # generation-stage wall-clock (re-anchors the fused-kernel
                 # claim, algorithms/base.py)
      run gen_delta python experiments/ours_multiseed.py \
          --models cvae_gan --modes balanced --seeds 0 \
          --out /tmp/gen_delta_check.jsonl || overall=1 ;;
    *) echo "unknown stage $s" | tee -a "$LOG" ;;
  esac
done
echo "queue pass finished (overall=$overall)" | tee -a "$LOG"
exit $overall
