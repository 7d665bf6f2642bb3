#!/bin/bash
# Round-5 queue, stage 3: runs after the ensembled full-budget rerank frees
# the chip. (1) A/B the new colfold top-k sweep variant against the argmax
# form end-to-end at 'highest' (the variant is bitwise-identical in outputs —
# proven by tests/test_pallas_hpd_stream.py — so whichever wins can carry the
# seed runs without affecting their trajectories); (2) run the scaled-recipe
# seed distribution with the winner; (3) end-of-session perf cells at
# 'default' precision incl. the vmem_serial scatter A/B (grad-order change —
# deliberately NOT used for the seed runs).
#
# $1 = pid of the in-flight rerank to wait for (exact pid).
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
  echo "=== rerank (pid $waitpid) finished ($(date -u +%FT%TZ)) ===" >> "$log"
fi

# --- colfold vs argmax, end-to-end, exact fp32 ---
echo "=== A/B scaled bench: colfold vs argmax ($(date -u +%FT%TZ)) ===" >> "$log"
timeout 900 env TOPK_SWEEP_VARIANT=colfold python bench.py --mode scaled \
  2>/dev/null | grep -v WARNING | tail -1 | tee /tmp/ab_colfold.json >> "$log"
timeout 900 env TOPK_SWEEP_VARIANT=argmax python bench.py --mode scaled \
  2>/dev/null | grep -v WARNING | tail -1 | tee /tmp/ab_argmax.json >> "$log"
WINNER=$(python3 - << 'EOF'
import json
try:
    c = json.load(open("/tmp/ab_colfold.json"))["value"]
except Exception:
    c = 0.0
try:
    a = json.load(open("/tmp/ab_argmax.json"))["value"]
except Exception:
    a = 0.0
print("colfold" if c >= a else "argmax")
EOF
)
echo "A/B winner: $WINNER" >> "$log"
export TOPK_SWEEP_VARIANT="$WINNER"

# --- scaled-recipe seed distribution (winner variant; bitwise-identical
#     selection either way) ---
for s in 7 42 123 2026; do
  run python tools/run_cold.py 5000 "$s" --scaled --encoding_lr=0.01 --no_hist
  bash tools/r5_harvest.sh >> "$log" 2>&1 || true
  if [ "$s" = "7" ]; then
    T=900 run python tools/usage_stats.py \
      weights/4061_cold_seed65535_scaled_elr0.01_jskl0_lcoll0 \
      weights/4061_cold_seed7_scaled_elr0.01
  fi
done

# --- end-of-session perf cells ---
T=900 run env TOPK_SWEEP_VARIANT=colfold python bench.py --mode scaled --precision default
T=900 run env TOPK_SWEEP_VARIANT=argmax python bench.py --mode scaled --precision default
T=900 run env TOPK_SWEEP_VARIANT=colfold BLEND_SCATTER_BACKEND=vmem_serial \
  python bench.py --mode scaled --precision default
T=900 run env TOPK_SWEEP_VARIANT=colfold python bench.py --mode scaled --precision high
T=900 run python bench.py
echo "r5 queue3 done ($(date -u +%FT%TZ))" >> "$log"
