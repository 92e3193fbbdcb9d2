#!/bin/bash
# Round-5c TPU session: RoIAlign fused/bf16-pyramid levers on the Faster
# R-CNN serving step. Sequential — ONE JAX process (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5c.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_roialign2.py 8 8
echo "session done: $LOG"
