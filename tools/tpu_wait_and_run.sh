#!/bin/bash
# Patient TPU session driver: ONE long-lived probe process (killed claimants
# re-queue on the axon pool, so never kill/retry — CLAUDE.md flakiness note),
# then the queued measurement runbook once the pool answers.
#
#   bash tools/tpu_wait_and_run.sh [logfile]
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session.log}
: > "$LOG"
echo "[$(date +%T)] probing axon pool (single patient process, 3600s cap)" | tee -a "$LOG"
if timeout 3600 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
  echo "[$(date +%T)] pool is up — running the measurement session" | tee -a "$LOG"
  bash tools/run_tpu_session.sh "$LOG.session"
  echo "[$(date +%T)] session done (see $LOG.session)" | tee -a "$LOG"
else
  echo "[$(date +%T)] pool still unavailable after the patient probe" | tee -a "$LOG"
fi
