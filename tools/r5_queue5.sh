#!/bin/bash
# Round-5 queue, stage 5: after seed 123, trade the 5th scaled seed for the
# macaw generalization runs (VERDICT r4 #6) at 'default' precision with the
# colfold sweep — ~25 min each at 569K px/s vs ~60 min exact, and the bf16
# quality class is pinned by prior cold runs (RESULTS r2/r3: bf16 lands
# inside the fp32 seed distribution). Then the remaining perf cells and, if
# time still remains, scaled seed 2026 at exact fp32.
#
# $1 = pid of the in-flight seed-123 run (exact pid).
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
  echo "=== seed42 (pid $waitpid) finished ($(date -u +%FT%TZ)) ===" >> "$log"
fi
bash tools/r5_harvest.sh >> "$log" 2>&1 || true

# seed 123 (queue4's loop was cut when its shell was replaced by this stage)
run env TOPK_SWEEP_VARIANT=argmax python tools/run_cold.py 5000 123 --scaled --encoding_lr=0.01 --no_hist
bash tools/r5_harvest.sh >> "$log" 2>&1 || true

# macaw generalization at the scaled recipe ('default' precision + colfold)
T=2700 run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist --precision=default --image=macaw.jpg
T=2700 run python tools/run_cold.py 5000 65535 --scaled --encoding_lr=0.01 --no_hist --precision=default --image=macaw2.jpg
bash tools/r5_harvest.sh >> "$log" 2>&1 || true

# remaining perf cells
T=900 run env TOPK_SWEEP_VARIANT=colfold python bench.py --mode scaled --precision high
T=900 run python bench.py --mode scaled
T=900 run python bench.py

# bonus if the session is still alive: the 5th scaled seed at exact fp32
run env TOPK_SWEEP_VARIANT=argmax python tools/run_cold.py 5000 2026 --scaled --encoding_lr=0.01 --no_hist
bash tools/r5_harvest.sh >> "$log" 2>&1 || true
T=900 run python bench.py
echo "r5 queue5 done ($(date -u +%FT%TZ))" >> "$log"
