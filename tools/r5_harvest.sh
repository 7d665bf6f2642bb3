#!/bin/bash
# Gzip round-5 per-epoch histories into evidence/ (runs/ is gitignored and
# wiped between rounds) and regenerate the summary tables from committed
# artifacts. Idempotent — run after each campaign phase.
set -u
cd "$(dirname "$0")/.."

for f in runs/strawberry_4061_cold_seed65535_scaled_elr0.01_lcoll0.jsonl \
         runs/strawberry_4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0.jsonl \
         runs/strawberry_4061_cold_seed7_scaled_elr0.01.jsonl \
         runs/strawberry_4061_cold_seed42_scaled_elr0.01.jsonl \
         runs/strawberry_4061_cold_seed123_scaled_elr0.01.jsonl \
         runs/strawberry_4061_cold_seed2026_scaled_elr0.01.jsonl \
         runs/macaw_4061_cold_seed65535_scaled_elr0.01.jsonl \
         runs/macaw2_4061_cold_seed65535_scaled_elr0.01.jsonl; do
  [ -s "$f" ] && gzip -c "$f" > "evidence/$(basename "$f").gz" && echo "gz: $f"
done
# rebuild-side flagship colds at the 1000-epoch oracle budget
for s in 7 42 123 2026 65535; do
  f=runs/strawberry_4061_cold_seed$s.jsonl
  [ -s "$f" ] && gzip -c "$f" > "evidence/rebuild_cold1000_seed$s.jsonl.gz"
done
# reference-oracle per-epoch histories (runs/ side, written by
# run_reference_cold.py; keep budget-suffixed copies)
for f in runs/reference_cold_seed*.jsonl; do
  [ -s "$f" ] || continue
  n=$(wc -l < "$f")
  # _e{epochs} suffix parses in summarize_oracle's evidence glob
  gzip -c "$f" > "evidence/$(basename "$f" .jsonl)_e${n}.jsonl.gz"
done
echo "--- seed distribution (scaled elr=0.01) ---"
python tools/summarize_seeds.py
echo "--- inertness diff (l_collisions=0 arm vs full) ---"
python tools/mechanism_study.py --diff \
  evidence/strawberry_4061_cold_seed65535_scaled_elr0.01.jsonl.gz \
  evidence/strawberry_4061_cold_seed65535_scaled_elr0.01_lcoll0.jsonl.gz \
  2>/dev/null || true
echo "--- oracle table @450 ---"
python tools/summarize_oracle.py 450
