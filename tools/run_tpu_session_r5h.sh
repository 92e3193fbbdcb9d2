#!/bin/bash
# Round-5h TPU session: FINAL round-5 bench under all flipped defaults
# (pre-warms the driver .jax_cache). Sequential — ONE JAX process.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session_r5h.log}
: > "$LOG"
echo "=== full bench.py (round-5 defaults) ===" | tee -a "$LOG"
timeout 9000 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? ---" | tee -a "$LOG"
echo "session done: $LOG"
