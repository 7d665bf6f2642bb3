"""Grid-search driver at scale (VERDICT round-1 item 8): run a real sharded
slice of the 48,000-config grid through the manifest machinery on hardware and
record configs/hour.

Runs `count` consecutive grid ids for `shards` simulated hosts (the shards
execute sequentially on this one chip; each owns ids[shard::shards] exactly as
a multi-host run would — grid_search.py:88-89), 300-epoch budget, with the
compile-sharing EpochFnCache so same-shape configs reuse one XLA program.

Usage: python tools/run_grid_demo.py [start=4048] [count=32] [epochs=300]
                                     [shards=2] [ensemble=1] [manifest-tag]
                                     [stride=1]
Prints one JSON summary line; manifest in runs/grid_demo{tag}_manifest.jsonl.
ensemble>1 trains that many same-shape configs per vmapped program
(trainer.fit_ensemble) — one compile per shape class for the whole group.
stride>1 runs a STRATIFIED sample — ids start, start+stride, ... (count of
them), covering the whole 48,000-id space instead of one contiguous slice
(VERDICT r4 #3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collision_handling_in_instantngp_tpu.data import load_image_dataset
from collision_handling_in_instantngp_tpu.train.grid_search import (
    run_grid_search,
)


def main(start, count, epochs, shards, ensemble=1, tag="", stride=1):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))
    manifest = f"runs/grid_demo{tag}_manifest.jsonl"

    ids = None if stride == 1 else list(range(start, start + count * stride, stride))
    t0 = time.perf_counter()
    all_rows = []
    for shard in range(shards):
        rows = run_grid_search(
            data,
            start_id=start,
            end_id=start + count,
            epochs=epochs,
            manifest_path=manifest,
            shard_index=shard,
            shard_count=shards,
            verbose=False,
            epoch_span=33,
            ensemble_size=ensemble,
            ids=ids,
        )
        all_rows.extend(rows)
        print(json.dumps({"shard": shard, "configs": len(rows),
                          "elapsed_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    dt = time.perf_counter() - t0

    best = max(all_rows, key=lambda r: r["best_psnr"])
    print(json.dumps({
        "configs": len(all_rows),
        "epochs_per_config": epochs,
        "wall_s": round(dt, 1),
        "configs_per_hour_per_chip": round(len(all_rows) / dt * 3600, 1),
        "best": {"grid_id": best["grid_id"],
                 "best_psnr": round(best["best_psnr"], 3)},
        "aborted_zero_collisions": sum(
            1 for r in all_rows if r["zero_collision_abort"]
        ),
        "stopped_early": sum(1 for r in all_rows if r["stopped_early"]),
    }))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if len(a) > 0 else 4048,
        int(a[1]) if len(a) > 1 else 32,
        int(a[2]) if len(a) > 2 else 300,
        int(a[3]) if len(a) > 3 else 2,
        int(a[4]) if len(a) > 4 else 1,
        a[5] if len(a) > 5 else "",
        int(a[6]) if len(a) > 6 else 1,
    )
