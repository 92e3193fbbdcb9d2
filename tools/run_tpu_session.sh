#!/bin/bash
# Round-3 TPU measurement session: runs the queued experiments SEQUENTIALLY
# (one JAX process at a time — CLAUDE.md environment rule) with per-script
# timeouts so a hung axon claim cannot eat the whole session.
#
#   bash tools/run_tpu_session.sh [logfile]
#
# Queue (in value order):
#   1. exp_orie2    — ORIE pair eval: mask gather vs one-hot matmul (2m/3m)
#                     and VPU cumsum vs MXU triangular matmul (3c/3x)
#   2. exp_confused — conf_fused serving tail A/B (bf16 + f32): the fused
#                     tail is already the production default; confirm it
#   3. exp_c3fuse   — C3 cv1/cv2 fused-conv knob A/B (bf16)
#   4. exp_gather7  — one-hot MXU matmul for the bf16 cls row gather
#   5. exp_ablate3  — serving tail stage breakdown under the fused contract
#   6. exp_trunk2   — layer-wise trunk profile (bf16)
#   7. bench.py     — headline numbers at current defaults (incl. int8 + train)
#   8. B=256 serving point
#   9. exp_rcnn     — Faster R-CNN serving profile
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_orie2.py 512 4
run python tools/exp_confused.py 128 16 bf16
run python tools/exp_confused.py 128 16 f32
run python tools/exp_c3fuse.py 128 16 bf16
run python tools/exp_gather7.py 128 8
run python tools/exp_ablate3.py 128 8 bf16 fused
run python tools/exp_trunk2.py 128 8 bf16
run python tools/exp_train_ablate.py 64 8 bf16
echo "=== bench.py (BENCH_YOLO_INT8=1) ===" | tee -a "$LOG"
BENCH_YOLO_INT8=1 timeout 4000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "=== B=256 serving ===" | tee -a "$LOG"
BENCH_YOLO_BATCH=256 BENCH_YOLO_ITERS=8 timeout 2400 python -c "
import bench; print(bench.run_yolo())" >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
run python tools/exp_rcnn.py
echo "=== yolov5m (strong detector) serving ===" | tee -a "$LOG"
BENCH_YOLO_VARIANT=m BENCH_YOLO_BATCH=64 BENCH_YOLO_ITERS=8 \
  timeout 2400 python -c "import bench; print(bench.run_yolo())" >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "session done: $LOG"
