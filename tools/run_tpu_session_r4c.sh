#!/bin/bash
# Round-4c TPU measurement session. Sequential — ONE JAX process at a time
# (CLAUDE.md rule; check `ps` for leftovers from prior sessions first).
#
#   bash tools/run_tpu_session_r4c.sh [logfile]
#
# Queue:
#   1. run_families   — SSD/RetinaNet after the fused-NMS K<=1024 gate
#                       (K=2048 crashes the axon remote compiler)
#   2. exp_rawserve   — RAW_TAIL A/B on the production pipelined step
#   3. exp_gsweep     — PAIR_G sweep, FIXED nested-jit cache clearing
#                       (the r4b sweep silently measured G=256 four times)
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4c.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
echo "=== run_families (post K<=1024 fused gate) ===" | tee -a "$LOG"
timeout 2400 python -c "import bench; print(bench.run_families())" \
  >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
run python tools/exp_rawserve.py 128 16 bf16 f32
run python tools/exp_gsweep.py 128 16 bf16 256 320 384 512
echo "session done: $LOG"
