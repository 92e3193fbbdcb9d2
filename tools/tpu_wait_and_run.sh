#!/bin/bash
# Patient TPU session driver: ONE claimant process at a time (killed
# claimants re-queue on the axon pool — CLAUDE.md flakiness note). Each
# probe attempt blocks until the pool answers or the backend raises
# UNAVAILABLE (observed 25+ min); on failure sleep and re-probe, on success
# run the queued measurement runbook.
#
#   bash tools/tpu_wait_and_run.sh [logfile]
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_session.log}
: > "$LOG"
while true; do
  echo "[$(date +%T)] probing axon pool (single patient claimant)" | tee -a "$LOG"
  if timeout 3600 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "[$(date +%T)] pool is up — running the measurement session" | tee -a "$LOG"
    bash tools/run_tpu_session.sh "$LOG.session"
    echo "[$(date +%T)] session done (see $LOG.session)" | tee -a "$LOG"
    break
  fi
  echo "[$(date +%T)] pool unavailable; sleeping 180s" | tee -a "$LOG"
  sleep 180
done
