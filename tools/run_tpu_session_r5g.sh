#!/bin/bash
# Round-5g TPU session: blocked fused NMS retry (static-slice fix), ORIE
# blocked-cumsum A/B at both scales, blocked gather retry (VPU offset
# select). Sequential — ONE JAX process (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5g.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_fused2k.py 16 8
run python tools/exp_cumblk.py 2048 5000
run python tools/exp_gblock.py 128 16
echo "session done: $LOG"
