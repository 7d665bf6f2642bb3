#!/bin/bash
# Round-5 resumed TPU queue (the previous session was cut off mid-campaign:
# phase A(b) pure-MSE control, phase B seeds, phase C macaws and the whole
# r5_hw_session never ran). One serial chain so the chip never idles, ordered
# by VERDICT r4 priority:
#
#   1. pure-MSE control to the full 5,000-epoch budget   (VERDICT #1b, ~52 min)
#   2. quick probes: bench x2, sweep_probe (measured tail sweep row, weak #6),
#      gather_probe                                       (VERDICT #4 evidence)
#   3. 4 more seeds of the scaled elr=0.01 recipe         (VERDICT #2, ~3.5 h)
#   4. full arm seed-65535 rerun (regenerates the checkpoint wiped with
#      weights/ between sessions; its per-epoch curve must be bitwise
#      identical to the committed evidence — a free reproducibility check)
#   5. usage_stats over control/full checkpoints          (VERDICT #1c)
#   6. full-budget rerank of the r4 screening winners, ensembled (VERDICT #3)
#   7. macaws under the scaled recipe                     (VERDICT #6)
#   8. stratified screening sweep, deadline-bounded       (VERDICT #3)
#
# r4 wedge lesson: every run under `timeout`; rc via PIPESTATUS[0]; exact
# PIDs only.
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r5_queue.log
run() {
  echo "=== $* ($(date -u +%FT%TZ)) ===" >> "$log"
  timeout "${T:-4500}" "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}

# 1. pure-MSE control, full budget
run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --l_js_kl=0 --l_collisions=0 --no_hist

# 2. quick probes
T=900 run python bench.py
T=900 run python bench.py --mode scaled
T=900 run python tools/sweep_probe.py --json-out evidence/sweep_probe.json
T=900 run python tools/gather_probe.py --json-out evidence/gather_probe.json

# 3. scaled-seed distribution
for s in 7 42 123 2026; do
  run python tools/run_cold.py 5000 "$s" --scaled --encoding_lr=0.01 --no_hist
done

# 4. full arm seed-65535 rerun (checkpoint regen + bitwise repro check)
run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist

# 5. slot-usage stats: control vs full (same seed, same budget)
T=900 run python tools/usage_stats.py \
  weights/4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0 \
  weights/4061_cold_seed65535_scaled_elr0.01

# 6. full-budget rerank of screening winners (ensembled)
T=7200 run python tools/rerank_top.py evidence/grid_demor4grid_manifest.jsonl 20 5000 8

# 7. macaws under the scaled recipe
run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist --image=macaw.jpg
run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist --image=macaw2.jpg

# 8. stratified sweep with whatever time remains (deadline; manifest-resumable)
SWEEP_DEADLINE_S=${SWEEP_DEADLINE_S:-3600}
echo "=== stratified sweep (deadline ${SWEEP_DEADLINE_S}s) $(date -u +%FT%TZ) ===" >> "$log"
timeout "$SWEEP_DEADLINE_S" python tools/run_grid_demo.py 0 5333 300 1 8 r5strat 9 >> "$log" 2>&1
echo "stratified rows: $(wc -l < runs/grid_demor5strat_manifest.jsonl 2>/dev/null || echo 0) rc=$? ($(date -u +%FT%TZ))" >> "$log"

run python bench.py
echo "r5 queue done ($(date -u +%FT%TZ))" >> "$log"
