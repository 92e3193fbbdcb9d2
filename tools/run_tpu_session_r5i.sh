#!/bin/bash
# Round-5i TPU session: all queued chip A/Bs in decision-impact order —
# (1) blocked fused NMS K=2048 retry (static-slice fix) -> FUSED_MAX_K,
# (2) ORIE blocked cumsum at both scales -> MM_CUMSUM mode,
# (3) train remat policies -> TRAIN_REMAT default,
# (4) RoIAlign unchunked at B=16 + bf16 B=8 -> ROI_CHUNK default,
# (5) blocked gather retry (VPU offset select).
# Sequential — ONE JAX process (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5i.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-3600}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_fused2k.py 16 8
run python tools/exp_cumblk.py 2048 5000
run python tools/exp_remat.py 64 8
run python tools/exp_roialign5.py 8
run python tools/exp_gblock.py 128 16
echo "session done: $LOG"
