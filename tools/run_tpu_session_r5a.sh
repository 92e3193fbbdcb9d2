#!/bin/bash
# Round-5a TPU session: POOL_SELECT A/B on the production serving step
# (plus the round-4 default as in-session reference). Sequential — ONE JAX
# process; check `ps` for leftovers FIRST (CLAUDE.md).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5a.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_poolsel.py 128 16
echo "session done: $LOG"
