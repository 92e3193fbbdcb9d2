#!/bin/bash
# Round-5f TPU session: unchunked-RoIAlign safety at B=16, remat policy A/B,
# blocked fused NMS at K=2048 (compile + serving A/B).
# Sequential — ONE JAX process (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5f.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_fused2k.py 16 8
run python tools/exp_roialign5.py 8
run python tools/exp_remat.py 64 8 bf16 f32
echo "session done: $LOG"
