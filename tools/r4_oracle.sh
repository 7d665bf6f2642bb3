#!/bin/bash
# Round-4 reference-oracle extension (VERDICT r3 #3): 2 more upstream
# torch-CPU cold seeds in parallel (2 threads each; the box has 4 cores and
# the TPU host + campaign need the rest). Per-seed logs; the shared
# evidence log gets only the final JSON summary lines.
set -u
cd "$(dirname "$0")/.."
seed=$1
export OMP_NUM_THREADS=${2:-2} MKL_NUM_THREADS=${2:-2}
python tools/run_reference_cold.py 450 "$seed" > "evidence/reference_cold_seed${seed}.log" 2>&1
rc=$?
grep -o '{"impl[^}]*}' "evidence/reference_cold_seed${seed}.log" >> evidence/reference_cold_cpu.log
echo "seed $seed rc=$rc ($(date -u +%FT%TZ))"
