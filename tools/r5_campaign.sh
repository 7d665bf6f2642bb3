#!/bin/bash
# Round-5 TPU campaign (VERDICT r4 next-round items 1, 2, 5, 6), chained so
# the chip never idles:
#
#  phase D (minutes): rebuild-side flagship cold runs at a 1,000-epoch budget
#    for the oracle-extension seeds (VERDICT #5) — the r4 rebuild colds only
#    ran 462 epochs, so extended-budget pairing needs fresh histories.
#  phase A (~1.8h): the thesis-mechanism arms (VERDICT #1) —
#    (a) l_collisions=0, l_js_kl=1: prediction = PSNR/MSE trajectory
#        BITWISE-identical to the committed full run (the collision-loss term
#        is a gradient-free constant; reference utils.py:108, train/loss.py),
#    (b) the pure-MSE control (l_js_kl=0, l_collisions=0) rerun to the full
#        5,000-epoch budget (the r4 attempt wedged at 3301/5000).
#  phase B (~3.5h): 4 more seeds of the scaled T=2^14/L=16 elr=0.01 recipe at
#    the full budget (VERDICT #2: give the single-seed 20.801 a distribution).
#  phase C (~1.7h): macaw.jpg + macaw2.jpg under the same scaled recipe
#    (VERDICT #6: does the recipe transfer across images?).
#
# r4 wedge lesson (VERDICT weak #8): each run goes under `timeout 4500` —
# a 5,000-epoch scaled run is ~52 min, so 75 min means a wedged device
# stream, and the bound keeps one wedge from eating the whole chain. Exact
# PIDs only; per-run rc recorded via PIPESTATUS[0] (a timeout kill shows as
# rc=124 in the log instead of silently vanishing).
set -u -o pipefail
cd "$(dirname "$0")/.."
log=evidence/hw_r5_campaign.log
run() {
  echo "=== $* ($(date -u +%FT%TZ)) ===" >> "$log"
  timeout 4500 "$@" 2>&1 | grep -v WARNING | tail -40 >> "$log"
  echo "rc=${PIPESTATUS[0]}" >> "$log"
}
phase=${1:-all}

if [ "$phase" = "d" ] || [ "$phase" = "all" ]; then
  # fresh histories: JsonlLogger appends and the 462-epoch r4 colds are
  # preserved in evidence/rebuild_cold450_seed*.jsonl.gz
  rm -f runs/strawberry_4061_cold_seed{7,42,123,2026,65535}.jsonl
  run python tools/run_cold.py 1000 7 42 123 2026 65535
fi
if [ "$phase" = "a" ] || [ "$phase" = "all" ]; then
  rm -f runs/strawberry_4061_cold_seed65535_scaled_elr0.01_lcoll0.jsonl \
        runs/strawberry_4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0.jsonl
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --l_collisions=0 --no_hist
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --l_js_kl=0 --l_collisions=0 --no_hist
fi
if [ "$phase" = "b" ] || [ "$phase" = "all" ]; then
  rm -f runs/strawberry_4061_cold_seed{7,42,123,2026}_scaled_elr0.01.jsonl
  for s in 7 42 123 2026; do
    run python tools/run_cold.py 5000 "$s" --scaled --encoding_lr=0.01 --no_hist
  done
fi
if [ "$phase" = "c" ] || [ "$phase" = "all" ]; then
  rm -f runs/macaw_4061_cold_seed65535_scaled_elr0.01.jsonl \
        runs/macaw2_4061_cold_seed65535_scaled_elr0.01.jsonl
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist --image=macaw.jpg
  run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist --image=macaw2.jpg
fi
echo "r5 campaign phase $phase done ($(date -u +%FT%TZ))" >> "$log"
