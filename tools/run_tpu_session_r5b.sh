#!/bin/bash
# Round-5b TPU session: blocked one-hot gather A/B + u8 input generation A/B
# on the production serving step. Sequential — ONE JAX process; check `ps`
# for leftovers FIRST (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5b.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_gblock.py 128 16
run python tools/exp_u8gen.py 128 16 bf16
echo "session done: $LOG"
