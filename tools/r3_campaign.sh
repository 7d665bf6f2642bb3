#!/bin/bash
# Round-3 quality/scale campaign: seed study (VERDICT #7), scaled-config
# quality (VERDICT #2), ensemble grid demo (VERDICT #8). Appends to
# evidence/hw_r3_campaign.log.
set -u
cd "$(dirname "$0")/.."
log=evidence/hw_r3_campaign.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  timeout 7000 "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=$?" >> "$log"
}
run python tools/run_cold.py 5000 1 7 11 31337 65535 2024 42 999 77 123 555 808 1234 4242 31415 27182 161803 777 2718 999999
run python tools/run_cold.py 3000 65535 --scaled
run python tools/run_grid_demo.py 4048 32 300 1 8 r3ens
echo "campaign done ($(date -u +%H:%M:%S))" >> "$log"
