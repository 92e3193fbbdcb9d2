#!/bin/bash
# Round-4f TPU measurement session. Sequential — ONE JAX process at a time;
# check `ps aux | grep python` for leftovers FIRST (CLAUDE.md).
#
#   bash tools/run_tpu_session_r4f.sh [logfile]
#
# Queue (tail levers from the r4e ablation):
#   1. exp_rawablate — re-run with: predict_raw pre-flatten row max,
#                      split one-hot payload matmuls, FIXED overlap probe
#   2. exp_pooltopk  — pool-ranking lax.top_k vs chunked topk1d
#   3. exp_rawserve  — end-to-end production step under the new tail
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4f.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_rawablate.py 128 8
run python tools/exp_pooltopk.py 128 16
run python tools/exp_rawserve.py 128 16 bf16
echo "session done: $LOG"
