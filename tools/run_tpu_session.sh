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
#   2. exp_confused — conf_fused serving tail A/B (bf16 + f32)
#   3. exp_ablate3  — serving tail stage breakdown under the fused contract
#   4. exp_gather7  — one-hot MXU matmul for the bf16 cls row gather
#   5. exp_trunk2   — layer-wise trunk profile (bf16)
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
run python tools/exp_ablate3.py 128 8 bf16 fused
run python tools/exp_gather7.py 128 8
run python tools/exp_trunk2.py 128 8 bf16
run python tools/exp_c3fuse.py 128 16 bf16
echo "session done: $LOG"
