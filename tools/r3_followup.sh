#!/bin/bash
# Round-3 follow-up: regenerate the macaw generalization evidence (the
# round-2 logs were gitignored and lost — VERDICT r2 weak #4), plus a
# 'high'-precision quality check. Copies summary artifacts into evidence/.
set -u
cd "$(dirname "$0")/.."
log=evidence/hw_r3_followup.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  timeout 7000 "$@" 2>&1 | grep -v WARNING | tail -20 >> "$log"
  echo "rc=$?" >> "$log"
}
run python tools/run_macaws.py 5000
run python tools/run_cold.py 5000 65535 --precision=high
echo "followup done ($(date -u +%H:%M:%S))" >> "$log"
