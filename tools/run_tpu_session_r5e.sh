#!/bin/bash
# Round-5e TPU session: RoIAlign W16/chunk sweep + SSDLite int8 throughput.
# Sequential — ONE JAX process (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5e.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_roialign4.py 8 8
run python tools/exp_q8ssd.py 16 8
echo "session done: $LOG"
