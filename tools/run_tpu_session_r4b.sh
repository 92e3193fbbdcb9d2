#!/bin/bash
# Round-4b TPU measurement session. Sequential — ONE JAX process at a time
# (CLAUDE.md environment rule); per-script timeouts sized for observed axon
# remote-compile variance (12–417 s per program).
#
#   bash tools/run_tpu_session_r4b.sh [logfile]
#
# Queue (in decision order):
#   1. exp_gather7 4 5 — one-hot row gather A/B on the PRODUCTION selection
#                        path (default flipped ON from the simplified-tail
#                        win; this confirms or reverts it)
#   2. exp_gsweep      — PAIR_G sweep under the one-hot gather (the cls
#                        gather cost is now ~G-independent; G only sizes the
#                        xywh gather + pool)
#   3. exp_rawtail     — raw-logit tail feasibility (skip the full-matrix
#                        sigmoid; decode per gathered row)
#   4. run_families    — SSD/RetinaNet/R-CNN after the fused-NMS vmem fix
#   5. ORIE at COCO-val 5k scale (VERDICT item 4): K growth + HBM fit
#   6. full bench.py   — headline record under the round-4 defaults; also
#                        pre-warms .jax_cache for the driver's bench run
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4b.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_gather7.py 128 8 4 5
run python tools/exp_gsweep.py 128 16 bf16 256 320 384 512
run python tools/exp_rawtail.py 128 8 bf16
echo "=== run_families (post vmem fix) ===" | tee -a "$LOG"
timeout 2400 python -c "import bench; print(bench.run_families())" \
  >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "=== ORIE at 5k-image scale ===" | tee -a "$LOG"
BENCH_N_IMG=5000 BENCH_SKIP_YOLO=1 BENCH_SKIP_STRONG=1 \
  BENCH_SKIP_FAMILIES=1 BENCH_SKIP_TRAIN=1 \
  timeout 2400 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "=== full bench.py (round-4 defaults) ===" | tee -a "$LOG"
BENCH_YOLO_INT8=1 timeout 6000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "session done: $LOG"
