#!/bin/bash
# Round-4 part-scale grid sweep (VERDICT r3 #4/#7): 1,024 consecutive grid
# ids (3584..4607 — the slice containing the reference's best id 4061)
# through the manifest driver with ensemble_size=8, INCLUDING a deliberate
# mid-sweep kill + manifest resume on hardware.
#
# Phase 1 launches the sweep, waits KILL_AFTER seconds, kills the exact PID
# (never a pattern), records the manifest row count at the kill; phase 2
# reruns the same command — the manifest makes completed configs no-ops —
# and runs to completion. The summary line's configs count covers the whole
# id range, proving the resume covered the gap.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_grid.log
KILL_AFTER=${KILL_AFTER:-1500}
START=${START:-3584}
COUNT=${COUNT:-1024}

echo "=== r4 grid sweep phase 1 (kill after ${KILL_AFTER}s) $(date -u +%FT%TZ) ===" >> "$log"
python tools/run_grid_demo.py "$START" "$COUNT" 300 1 8 r4grid >> "$log" 2>&1 &
pid=$!
sleep "$KILL_AFTER"
if kill -0 "$pid" 2>/dev/null; then
  kill "$pid"
  wait "$pid" 2>/dev/null
  done_rows=$(wc -l < runs/grid_demor4grid_manifest.jsonl 2>/dev/null || echo 0)
  echo "killed pid $pid at $(date -u +%FT%TZ); manifest rows at kill: $done_rows" >> "$log"
else
  echo "sweep finished before the kill window — resume demo degenerate" >> "$log"
fi

echo "=== r4 grid sweep phase 2 (manifest resume) $(date -u +%FT%TZ) ===" >> "$log"
python tools/run_grid_demo.py "$START" "$COUNT" 300 1 8 r4grid 2>&1 | grep -v WARNING | tail -20 >> "$log"
echo "rc=${PIPESTATUS[0]}" >> "$log"
echo "grid sweep done $(date -u +%FT%TZ)" >> "$log"
