#!/bin/bash
# Rebalanced round-5 TPU queue (replaces r5_queue.sh mid-flight: measured
# scaled-run pace this session is ~1.4 epochs/s => ~60 min per 5,000-epoch
# run, and the host does NOT survive between sessions, so the original
# 8-item chain cannot finish. Kept, in priority order: probes, the
# full-budget rerank of screening winners (VERDICT #3), then as many
# scaled-recipe seeds as fit (VERDICT #2), with usage_stats after the first
# full-recipe checkpoint exists (VERDICT #1c). Dropped: the full-arm
# seed-65535 rerun (usage_stats uses a full-recipe seed checkpoint instead),
# macaws, the stratified sweep.
#
# $1 = pid of the in-flight control run to wait for (exact pid, no patterns).
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
  echo "=== control (pid $waitpid) finished ($(date -u +%FT%TZ)) ===" >> "$log"
fi

# quick probes (perf evidence: measured tail sweep + scatter ladder)
T=900 run python bench.py
T=900 run python bench.py --mode scaled
T=1500 run python tools/sweep_probe.py --json-out evidence/sweep_probe.json
T=1500 run python tools/gather_probe.py --json-out evidence/gather_probe.json

# full-budget rerank of the r4 screening winners (ensembled, resumable)
T=6000 run python tools/rerank_top.py evidence/grid_demor4grid_manifest.jsonl 20 5000 8

# scaled-recipe seed distribution, one seed at a time (each ~60 min; the
# manifest of record is the per-seed JSONL in runs/, harvested after each)
for s in 7 42 123 2026; do
  run python tools/run_cold.py 5000 "$s" --scaled --encoding_lr=0.01 --no_hist
  bash tools/r5_harvest.sh >> "$log" 2>&1 || true
  if [ "$s" = "7" ]; then
    T=900 run python tools/usage_stats.py \
      weights/4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0 \
      weights/4061_cold_seed7_scaled_elr0.01
  fi
done

T=900 run python bench.py
echo "r5 queue2 done ($(date -u +%FT%TZ))" >> "$log"
