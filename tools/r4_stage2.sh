#!/bin/bash
# Round-4 TPU stage 2: (1) rebuild-side oracle cold runs (five seeds, 462
# epochs = 14 spans of 33, > the 450-epoch CPU budget) for the same-seed/
# same-budget table; (2) the decisive scaled-quality runs (campaign phase a).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_session.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
rm -f runs/strawberry_4061_cold_seed42.jsonl runs/strawberry_4061_cold_seed65535.jsonl \
      runs/strawberry_4061_cold_seed123.jsonl runs/strawberry_4061_cold_seed7.jsonl \
      runs/strawberry_4061_cold_seed2026.jsonl
run timeout 3000 python tools/run_cold.py 462 65535 42 123 7 2026 --no_hist
for s in 65535 42 123 7 2026; do
  f=runs/strawberry_4061_cold_seed$s.jsonl
  [ -f "$f" ] && gzip -c "$f" > evidence/rebuild_cold450_seed$s.jsonl.gz
done
bash tools/r4_campaign.sh a
