"""Full-budget re-ranking of grid-screening winners (VERDICT r4 #3: "re-run
the top ~20 DISTINCT (degeneracy-deduped) screening winners at the full
5,000-epoch budget. If any beats 4061's full-budget PSNR, that's the round's
headline").

Reads a screening manifest, dedups configs that beat 4061 by
grid_leaderboard.effective_key (trajectory-identical configs collapse to
their best representative), takes the top N distinct ids, and re-runs them —
plus 4061 itself as the same-protocol anchor — at the reference's full
protocol: 5,000-epoch budget WITH the reference's EarlyStopping
(tolerance=500, the protocol that produced the published 20.331,
reference params.py:45-48). Appends to its own manifest so the run is
kill-resumable like every sweep.

Usage: python tools/rerank_top.py [screening_manifest] [top_n] [epochs]
                                  [ensemble_size]

ensemble_size>1 trains same-shape winners through ``fit_ensemble`` (one
vmapped program per shape class) — manifest rows are identical to the
sequential path (grid_search._run_ensembled).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grid_leaderboard import effective_key, DEFAULT  # noqa: E402

from collision_handling_in_instantngp_tpu.data import load_image_dataset  # noqa: E402
from collision_handling_in_instantngp_tpu.train.grid_search import (  # noqa: E402
    run_grid_search,
)


def pick_ids(manifest_path, top_n):
    rows = [json.loads(l) for l in open(manifest_path)]
    rows.sort(key=lambda r: -r["best_psnr"])
    ref = next((r for r in rows if r["grid_id"] == 4061), None)
    better = [r for r in rows if ref and r["best_psnr"] > ref["best_psnr"]]
    distinct = {}
    for r in better:  # rows already best-first: keep the best representative
        distinct.setdefault(effective_key(r["grid_id"]), r)
    winners = [r["grid_id"] for r in list(distinct.values())[:top_n]]
    return winners, ref


def main(manifest_path=DEFAULT, top_n=20, epochs=5000, ensemble=1):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    winners, ref_row = pick_ids(manifest_path, top_n)
    ids = winners + [4061]
    print(json.dumps({"rerank_ids": ids,
                      "screening_manifest": manifest_path}), flush=True)
    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))
    rows = run_grid_search(
        data,
        ids=ids,
        epochs=epochs,
        manifest_path="runs/rerank_full_manifest.jsonl",
        verbose=False,
        epoch_span=33,
        ensemble_size=ensemble,
    )
    rows.sort(key=lambda r: -r["best_psnr"])
    ref = next((r for r in rows if r["grid_id"] == 4061), None)
    out = {
        "budget": epochs,
        "protocol": "reference early stopping (tolerance=500)",
        "n_rerun": len(rows),
        "best": {"grid_id": rows[0]["grid_id"],
                 "best_psnr": round(rows[0]["best_psnr"], 4),
                 "epochs_run": rows[0]["epochs_run"]},
        "anchor_4061": (
            {"best_psnr": round(ref["best_psnr"], 4),
             "epochs_run": ref["epochs_run"]} if ref else None
        ),
        "beat_4061_full_budget": sorted(
            r["grid_id"] for r in rows
            if ref and r["best_psnr"] > ref["best_psnr"]
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if len(a) > 0 else DEFAULT,
         int(a[1]) if len(a) > 1 else 20,
         int(a[2]) if len(a) > 2 else 5000,
         int(a[3]) if len(a) > 3 else 1)
