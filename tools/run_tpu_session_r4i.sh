#!/bin/bash
# Round-4i TPU session: final round-4 numbers under ALL flipped defaults
# (RAW_TAIL=bf16, RAW_GATHER=concat, FULL pool, POOL_TOPK none). Sequential
# — ONE JAX process; check `ps` for leftovers FIRST (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r4i.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_rawablate.py 128 8
run python tools/exp_rawserve.py 128 16 bf16
echo "=== full bench.py (final round-4 defaults; pre-warms driver cache) ===" | tee -a "$LOG"
timeout 6000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "session done: $LOG"
