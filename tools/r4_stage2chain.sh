#!/bin/bash
# Round-4 chained TPU queue (runs unattended after stage 1):
#   1b. attribution rerun at 3 precisions (value_and_grad fix — the first
#       pass double-ran the forward in every backward program)
#   2.  rebuild-side oracle cold runs (5 seeds x 462 epochs > the 450 CPU
#       budget), gzipped into evidence/ (runs/ is gitignored)
#   3.  scaled-quality campaign phase a (the two decisive 5000-epoch runs)
#   4.  pure-MSE control at the scaled geometry (l_js_kl=0, l_collisions=0,
#       elr=0.01): does collision handling help or hurt at T=2^14/L=16?
#       (phase b's second knob run, elr=0.003, is dropped for clock room —
#       logged here so the omission is explicit)
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r4_session.log
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$log"
  "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
bash tools/r4_stage1b.sh
rm -f runs/strawberry_4061_cold_seed42.jsonl runs/strawberry_4061_cold_seed65535.jsonl \
      runs/strawberry_4061_cold_seed123.jsonl runs/strawberry_4061_cold_seed7.jsonl \
      runs/strawberry_4061_cold_seed2026.jsonl
run timeout 3600 python tools/run_cold.py 462 65535 42 123 7 2026 --no_hist
for s in 65535 42 123 7 2026; do
  f=runs/strawberry_4061_cold_seed$s.jsonl
  [ -f "$f" ] && gzip -c "$f" > evidence/rebuild_cold450_seed$s.jsonl.gz
done
bash tools/r4_campaign.sh a
for f in runs/strawberry_4061_cold_seed65535_scaled.jsonl \
         runs/strawberry_4061_cold_seed65535_scaled_elr0.01.jsonl; do
  [ -f "$f" ] && gzip -c "$f" > "evidence/$(basename "$f").gz"
done
rm -f runs/strawberry_4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0.jsonl
run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --l_js_kl=0 --l_collisions=0 --no_hist
f=runs/strawberry_4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0.jsonl
[ -f "$f" ] && gzip -c "$f" > "evidence/$(basename "$f").gz"
echo "stage2 chain done ($(date -u +%H:%M:%S))" >> "$log"
