#!/bin/bash
# Round-4d TPU measurement session. Sequential — ONE JAX process at a time;
# check `ps aux | grep python` for leftover sessions from prior rounds FIRST
# (CLAUDE.md flakiness notes).
#
#   bash tools/run_tpu_session_r4d.sh [logfile]
#
# Queue:
#   1. exp_stem3     — stem+l1 cost breakdown (cast / s2d / convs): the
#                      trunk is 41% stem (exp_trunk2) at ~3x its roofline
#   2. exp_rawserve 256 — does the raw tail change the B=128-vs-256 balance?
#   3. full bench.py — headline capture under RAW_TAIL="bf16" + families;
#                      also pre-warms .jax_cache for the driver's bench run
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4d.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_stem3.py 128 16 bf16
run python tools/exp_rawserve.py 256 8 bf16
echo "=== full bench.py (RAW_TAIL=bf16 defaults) ===" | tee -a "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "session done: $LOG"
