#!/bin/bash
# Round-5 queue, stage 4 (supersedes queue3's tail once seed 7 is in
# flight). Order: harvest+usage_stats for seed 7, the 3761-vs-4061 seed
# panel (one vmapped 10-member program — gives the rerank's 20.802 headline
# a distribution), the 'default'-precision perf cells EARLY (colfold vs
# argmax vs vmem_serial — the sweep is dot-hidden at 'highest' but exposed
# at bf16, so this is where the colfold variant must prove itself), then
# the remaining scaled-recipe seeds.
#
# $1 = pid of the in-flight seed-7 run (exact pid).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r5_queue.log
run() {
  echo "=== $* ($(date -u +%FT%TZ)) ===" >> "$log"
  timeout "${T:-4800}" "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}

waitpid=${1:-}
if [ -n "$waitpid" ]; then
  while kill -0 "$waitpid" 2>/dev/null; do sleep 20; done
  echo "=== seed7 (pid $waitpid) finished ($(date -u +%FT%TZ)) ===" >> "$log"
fi

bash tools/r5_harvest.sh >> "$log" 2>&1 || true
T=900 run python tools/usage_stats.py \
  weights/4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0 \
  weights/4061_cold_seed7_scaled_elr0.01

# seed panel: 5 seeds x {3761, 4061} at the reference protocol
T=3600 run python tools/seed_panel.py 5000
gzip -c runs/seed_panel_manifest.jsonl > evidence/seed_panel_manifest.jsonl.gz 2>/dev/null

# 'default'-precision perf cells
T=900 run env TOPK_SWEEP_VARIANT=colfold python bench.py --mode scaled --precision default
T=900 run env TOPK_SWEEP_VARIANT=argmax python bench.py --mode scaled --precision default
T=900 run env TOPK_SWEEP_VARIANT=argmax BLEND_SCATTER_BACKEND=vmem_serial \
  python bench.py --mode scaled --precision default

# remaining scaled-recipe seeds
for s in 42 123 2026; do
  run env TOPK_SWEEP_VARIANT=argmax python tools/run_cold.py 5000 "$s" --scaled --encoding_lr=0.01 --no_hist
  bash tools/r5_harvest.sh >> "$log" 2>&1 || true
done

T=900 run env TOPK_SWEEP_VARIANT=colfold python bench.py --mode scaled --precision high
T=900 run python bench.py
echo "r5 queue4 done ($(date -u +%FT%TZ))" >> "$log"
