#!/bin/bash
# Re-run the per-stage attribution with the value_and_grad fix (the first
# pass's backward rows carried a double forward; see attribution.py).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_session.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  timeout 2400 "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
run python tools/attribution.py --mode scaled --json-out evidence/attribution_scaled_highest.json
run python tools/attribution.py --mode scaled --precision high --json-out evidence/attribution_scaled_high.json
run python tools/attribution.py --mode scaled --precision default --json-out evidence/attribution_scaled_default.json
echo "stage1b done ($(date -u +%H:%M:%S))" >> "$log"
