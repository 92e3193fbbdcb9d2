#!/bin/bash
# Trimmed round-3 TPU session for a short wall-clock window: the
# decision-informing A/Bs only (they pick production defaults). bench.py
# is NOT run here — launch it separately after reviewing the A/B results.
# Sequential — one JAX process at a time (CLAUDE.md rule).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session.log}
: > "$LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  # Default must survive observed axon remote-compile variance (up to 417s
  # per program; exp_orie2 compiles up to 8 stage variants — CLAUDE.md).
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}
run python tools/exp_confused.py 128 16 bf16
run python tools/exp_c3fuse.py 128 16 bf16
run python tools/exp_orie2.py 512 4
run python tools/exp_gather7.py 128 8
echo "session short queue done (pre-bench): $LOG"
