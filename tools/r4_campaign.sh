#!/bin/bash
# Round-4 scaled-table QUALITY campaign (VERDICT r3 #2): finish the truncated
# scaled run at the full 5,000-epoch budget and sweep the two knobs the
# truncation pointed at — encoding_lr (the 4061 recipe's 1e-4 was tuned for
# T=2^8 tables; InstantNGP-scale tables train at ~1e-2) and the JS/KL +
# collision regularizers (a pure-MSE control isolates whether collision
# handling helps or hurts at T=2^14/L=16).
#
# Histogram epochs are disabled (--no_hist): at the scaled geometry they cost
# ~3 s each (cell-table stats + 16 matplotlib figures) and the quality study
# doesn't consume them; spans train at ~0.85 s/epoch, so each 5,000-epoch run
# is ~1.2h on the v5e chip.
#
# Split into phase a (the two decisive runs) and phase b (the two secondary
# knob runs) so a TPU-relay outage compresses gracefully.
#
# r3_campaign.sh lesson (VERDICT weak #7): rc=$? after a pipeline recorded
# tail's status and a timeout-kill went unnoticed. Here: pipefail +
# PIPESTATUS[0], and NO timeout wrapper — the runs are sized to the budget.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_campaign.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
phase=${1:-all}
if [ "$phase" = "a" ] || [ "$phase" = "all" ]; then
  # fresh JSONLs: JsonlLogger appends, and seed65535_scaled already holds the
  # r3 truncated run (preserved in evidence/scaled_cold_seed65535.jsonl.gz)
  rm -f runs/strawberry_4061_cold_seed65535_scaled.jsonl \
        runs/strawberry_4061_cold_seed65535_scaled_elr0.01.jsonl
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist
  run python tools/run_cold.py 5000 65535 --scaled --no_hist
fi
if [ "$phase" = "b" ] || [ "$phase" = "all" ]; then
  rm -f runs/strawberry_4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0.jsonl \
        runs/strawberry_4061_cold_seed65535_scaled_elr0.003.jsonl
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --l_js_kl=0 --l_collisions=0 --no_hist
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.003 --no_hist
fi
echo "campaign phase $phase done ($(date -u +%H:%M:%S))" >> "$log"
