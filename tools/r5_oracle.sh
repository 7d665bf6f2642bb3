#!/bin/bash
# Round-5 reference-oracle extension (VERDICT r4 #5): upstream torch-CPU cold
# runs PAST the 450-epoch noise floor — usage: r5_oracle.sh SEED EPOCHS [THREADS].
# ~26 s/epoch at 2 threads on this 4-core box, so 1,000 epochs ≈ 7.2 h; runs
# under nice so the TPU host process and the interactive session keep
# priority (r4's device-stream wedge happened under full CPU saturation —
# see RESULTS round-5 wedge note). Partial runs are harvestable: the per-epoch
# JSONL gives best-at-budget for any budget the run reached.
set -u
cd "$(dirname "$0")/.."
seed=$1
epochs=$2
export OMP_NUM_THREADS=${3:-2} MKL_NUM_THREADS=${3:-2}
nice -n 10 python tools/run_reference_cold.py "$epochs" "$seed" \
  > "evidence/reference_cold_seed${seed}_e${epochs}.log" 2>&1
rc=$?
grep -o '{"impl[^}]*}' "evidence/reference_cold_seed${seed}_e${epochs}.log" \
  >> evidence/reference_cold_cpu.log
echo "seed $seed epochs $epochs rc=$rc ($(date -u +%FT%TZ))"
