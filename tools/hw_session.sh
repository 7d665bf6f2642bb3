#!/bin/bash
# One-shot hardware measurement ladder for a TPU session (run after the axon
# tunnel recovers). Each step is independently timeout-guarded so a wedge
# costs one step, not the session. Results land in evidence/hw_session_<ts>.log.
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
log="evidence/hw_session_${ts}.log"
mkdir -p evidence
run() {
  echo "=== $* ===" | tee -a "$log"
  timeout 2900 "$@" 2>&1 | tail -20 | tee -a "$log"
}
run python tools/mxu_probe.py
run python tools/gather_probe.py
run python tools/time_kernels.py
run python tools/ablate_scaled.py --batch-fraction 0.3333333333333333
run python tools/ablate_scaled.py --batch-fraction 0.3333333333333333 --cell-gather
run python bench.py --mode scaled
run python bench.py --mode scaled --precision high
run python bench.py
run python tools/roofline.py --mode scaled --measure
echo "done -> $log"
