#!/bin/bash
# Round-5 measurement + grid session (runs AFTER r5_campaign.sh frees the
# chip). Ordered by verdict value; every step timeboxed; the stratified
# screening sweep runs LAST with a hard deadline and is manifest-resumable,
# so whatever fraction completes is banked.
#
#   1. bench regression check (flagship + scaled)
#   2. sweep_probe: measured streaming-tail phase decomposition (weak #6)
#   3. usage_stats: slot-usage/marginal entropy for the scaled-arm
#      checkpoints (mechanism study, #1c)
#   4. rerank_top: full-budget re-run of the r4 screening winners (#3)
#   5. ensemble-size probe: 8 vs 16 vs 32 on 64 configs (throughput knob)
#   6. stratified screening sweep: ids 0..47999 stride 9 (5,333 configs),
#      killed at SWEEP_DEADLINE_S; rows persist in the manifest
#   7. final bench
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r5_session.log
SWEEP_DEADLINE_S=${SWEEP_DEADLINE_S:-7200}
ENSEMBLE=${ENSEMBLE:-8}
run() {
  echo "=== $* ($(date -u +%FT%TZ)) ===" >> "$log"
  timeout "${T:-900}" "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}

run python bench.py
run python bench.py --mode scaled
run python tools/sweep_probe.py --json-out evidence/sweep_probe.json
run python tools/gather_probe.py --json-out evidence/gather_probe.json
run python tools/usage_stats.py \
  weights/4061_cold_seed65535_scaled_elr0.01 \
  weights/4061_cold_seed65535_scaled_elr0.01_lcoll0 \
  weights/4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0

T=2400 run python tools/attribution.py --precision default \
  --json-out evidence/attribution_scaled_default.json

T=3600 run python tools/rerank_top.py evidence/grid_demor4grid_manifest.jsonl 20 5000

# ensemble-size probe: same 64 stratified ids at each size, fresh manifests
for e in 8 16 32; do
  rm -f "runs/grid_demoens${e}probe_manifest.jsonl"
  T=1200 run python tools/run_grid_demo.py 100 64 300 1 "$e" "ens${e}probe" 701
done

echo "=== stratified sweep (deadline ${SWEEP_DEADLINE_S}s) $(date -u +%FT%TZ) ===" >> "$log"
python tools/run_grid_demo.py 0 5333 300 1 "$ENSEMBLE" r5strat 9 >> "$log" 2>&1 &
pid=$!
(
  sleep "$SWEEP_DEADLINE_S"
  if kill -0 "$pid" 2>/dev/null; then
    kill "$pid"
    echo "stratified sweep killed at deadline; manifest rows: $(wc -l < runs/grid_demor5strat_manifest.jsonl 2>/dev/null || echo 0)" >> "$log"
  fi
) &
watcher=$!
wait "$pid" 2>/dev/null
kill "$watcher" 2>/dev/null
echo "stratified rows: $(wc -l < runs/grid_demor5strat_manifest.jsonl 2>/dev/null || echo 0) ($(date -u +%FT%TZ))" >> "$log"

run python bench.py
echo "r5 hw session done ($(date -u +%FT%TZ))" >> "$log"
