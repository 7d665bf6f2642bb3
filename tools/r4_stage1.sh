#!/bin/bash
# Round-4 TPU stage 1 (resume of r4_hw_session.sh after the 03:12 session
# cut): per-stage attribution at all three precisions, roofline fractions
# from the committed calibration artifact, bench regression check.
# mxu_probe already ran (evidence/roofline_calibration.json).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_session.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  timeout 1500 "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
run python tools/attribution.py --mode scaled --json-out evidence/attribution_scaled_highest.json
run python tools/attribution.py --mode scaled --precision high --json-out evidence/attribution_scaled_high.json
run python tools/attribution.py --mode scaled --precision default --json-out evidence/attribution_scaled_default.json
run python tools/roofline.py --mode scaled --measure
run python tools/roofline.py --mode scaled --measure --precision high
run python tools/roofline.py --mode scaled --measure --precision default
run python bench.py
run python bench.py --mode scaled
echo "stage1 done ($(date -u +%H:%M:%S))" >> "$log"
