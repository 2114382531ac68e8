#!/bin/bash
# SUPERSEDED (round 5): use experiments/round5_tpu_queue.sh, which waits
# with backoff on a down relay and records per-stage done markers.
# Kept for the round-4 record.
#
# Round-4 TPU measurement queue — run when the axon relay is back.
#
# Serializes every TPU leg pending on the relay outage (VERDICT r3 items
# 1-4, 6), with the 120 s inter-process gap the tunnel needs (verify
# skill gotchas). Each stage appends to $LOG; stages are idempotent /
# resumable where the underlying harness is. Run from the repo root:
#
#   bash experiments/round4_tpu_queue.sh [stage ...]   # default: all
#
# Stages: bench bank_f32 bank_bf16 ms_bf16 warm4m faithful1m gen_delta
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-experiments/results/round4_tpu_queue.log}
GAP=${GAP:-120}
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

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] $name ===" | tee -a "$LOG"
  timeout 5400 "$@" >>"$LOG" 2>&1
  echo "=== [$(date -u +%H:%M:%S)] $name rc=$?" | tee -a "$LOG"
  sleep "$GAP"
}

if ! probe; then
  echo "axon relay down (port 8082 refused) — aborting" | tee -a "$LOG"
  exit 1
fi

for s in $STAGES; do
  case $s in
    bench)       # item 1: re-capture the driver number (hard-deadlined)
      run bench python bench.py ;;
    bank_f32)    # item 2 control arm: f32 K-curve on the current code
      run bank_f32 python experiments/bank_scaling.py --dtype float32 ;;
    bank_bf16)   # item 2: bf16 K-curve
      run bank_bf16 python experiments/bank_scaling.py --dtype bfloat16 ;;
    ms_bf16)     # item 2: n=30 quality parity, bank-mode, bf16 arm
      run ms_bf16 python experiments/ours_multiseed.py --bank \
          --dtype bfloat16 --models cvae_gan --modes balanced \
          --seeds 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 \
                  20 21 22 23 24 25 26 27 28 29 \
          --out experiments/results/ours_multiseed.jsonl ;;
    warm4m)      # item 4: cache-warm 4M pipeline (cold first if no cache)
      run warm4m_cold python experiments/ours_scale_4m.py \
          --data /tmp/can_4m --out experiments/results/ours_scale_4m_cold.json
      run warm4m_warm python experiments/ours_scale_4m.py \
          --data /tmp/can_4m --out experiments/results/ours_scale_4m_warm.json ;;
    faithful1m)  # item 6: 1M on the schema-faithful stand-in
      run faithful1m python experiments/ours_scale_4m.py --faithful \
          --frames 1000000 --data /tmp/can1m_faithful \
          --out experiments/results/ours_scale_1m_faithful.json ;;
    gen_delta)   # item 3: generation-stage wall-clock on the imbalanced fixture
      run gen_delta python experiments/ours_multiseed.py \
          --models cvae_gan --modes balanced --seeds 0 \
          --out /tmp/gen_delta_check.jsonl ;;
    *) echo "unknown stage $s" | tee -a "$LOG" ;;
  esac
done
echo "queue complete" | tee -a "$LOG"
