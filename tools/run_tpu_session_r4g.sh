#!/bin/bash
# Round-4g TPU measurement session. Sequential — ONE JAX process at a time;
# check `ps aux | grep python` for leftovers FIRST (CLAUDE.md).
#
#   bash tools/run_tpu_session_r4g.sh [logfile]
#
# Queue:
#   1. exp_rawgather — one-hot gather layout A/B (concat/split/narrow),
#                      stage-2 AND full production step
#   2. exp_rawablate — stage distribution + FIXED overlap probe
#   3. full bench.py — headline under the winning defaults; pre-warms cache
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4g.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_rawgather.py 128 12
run python tools/exp_rawablate.py 128 8
echo "=== full bench.py ===" | tee -a "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "session done: $LOG"
