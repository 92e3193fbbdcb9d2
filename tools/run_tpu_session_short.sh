#!/bin/bash
# Trimmed round-3 TPU session for a short wall-clock window: the
# decision-informing A/Bs first (they pick production defaults), then
# bench.py to record headline numbers under whatever defaults win.
# Sequential — one JAX process at a time (CLAUDE.md rule).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-900}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_confused.py 128 16 bf16
run python tools/exp_c3fuse.py 128 16 bf16
run python tools/exp_orie2.py 512 4
run python tools/exp_gather7.py 128 8
echo "session short queue done (pre-bench): $LOG"
