#!/bin/bash
# Round-4 measurement ladder (run when the chip is attached and idle):
#   1. fixed HBM read+write probe + calibration artifact (VERDICT r3 #6)
#   2. per-stage attribution tables at all three precisions (VERDICT r3 #5)
#   3. roofline fractions for exact/high/default from the artifact
#   4. flagship + scaled bench regression check
# Appends to evidence/hw_r4_session.log; pipefail + PIPESTATUS (r3 lesson).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_session.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
run python tools/mxu_probe.py
run python tools/attribution.py --mode scaled --json-out evidence/attribution_scaled_highest.json
run python tools/attribution.py --mode scaled --precision high --json-out evidence/attribution_scaled_high.json
run python tools/attribution.py --mode scaled --precision default --json-out evidence/attribution_scaled_default.json
run python tools/roofline.py --mode scaled --measure
run python tools/roofline.py --mode scaled --measure --precision high
run python tools/roofline.py --mode scaled --measure --precision default
run python bench.py
run python bench.py --mode scaled
echo "hw session done ($(date -u +%H:%M:%S))" >> "$log"
