#!/bin/bash
# Round-4e TPU measurement session. Sequential — ONE JAX process at a time;
# check `ps aux | grep python` for leftover sessions FIRST (CLAUDE.md).
#
#   bash tools/run_tpu_session_r4e.sh [logfile]
#
# Queue:
#   1. exp_rawablate — raw-tail stage distribution + scheduler-overlap probe
#   2. exp_u8serve   — uint8 input interface A/B (pregenerated device bufs)
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4e.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_rawablate.py 128 8
run python tools/exp_u8serve.py 128 16 bf16
echo "session done: $LOG"
