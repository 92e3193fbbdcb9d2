#!/bin/bash
# Round-5j TPU session: trunk-MFU localization — per-stage cumulative
# trunk ablation, then the block-diagonal 1x1 micro-probe.
# Sequential — ONE JAX process (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5j.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_trunkstages.py 128 16
run python tools/exp_mm1x1.py 128 8 16
run python tools/exp_bucket.py 2048 5000
run python tools/exp_trainbatch.py 8
run python tools/exp_retinaraw.py 16 8
echo "session done: $LOG"
