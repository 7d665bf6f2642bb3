#!/bin/bash
# Round-3 follow-up TPU batch:
#  1. regenerate the macaw generalization evidence (VERDICT r2 weak #4 — the
#     round-2 logs were gitignored and lost)
#  2. cold-quality run with the true 3-pass 'high' kernels (quality proof for
#     the 359K px/s fast mode)
#  3. 'default' (1-pass bf16 dots) scaled bench + stage ablation — the next
#     rung of the precision/throughput ladder (62.9 TF/s dot ceiling)
#  4. full 5000-epoch scaled-config quality run (VERDICT r2 #2; the campaign
#     run hit its timeout at epoch 1901 / PSNR 17.46 still climbing)
# Appends to evidence/hw_r3_followup.log; summary JSONs land in runs/ and are
# copied into evidence/ by the driver of this script.
set -u
cd "$(dirname "$0")/.."
log=evidence/hw_r3_followup.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  timeout "$T" "$@" 2>&1 | grep -v WARNING | tail -25 >> "$log"
  echo "rc=$?" >> "$log"
}
T=4000 run python tools/run_macaws.py 5000
T=4000 run python tools/run_cold.py 5000 65535 --precision=high
T=2000 run python bench.py --mode scaled --precision default
T=2000 run python tools/ablate_scaled.py --precision default --batch-fraction 0.333333

echo "followup done ($(date -u +%H:%M:%S))" >> "$log"
