"""PSNR leaderboard for a grid-sweep manifest (VERDICT r3 #7 / r4 weak #4:
report whether any config beats the reference's chosen 4061 under the
sweep's budget, counting DISTINCT effective configs — several grid axes are
no-ops in parts of the space (e.g. loss_gamma when l_js_kl=0; the reference's
own enumeration keeps them, reference params.py:58-75 + functions.py:452-474),
so raw "N configs beat 4061" overcounts ~4x).

Usage: python tools/grid_leaderboard.py [manifest.jsonl] [top_n]
Defaults to the committed evidence/grid_demor4grid_manifest.jsonl (runs/ is
gitignored and wiped between rounds — ADVICE r4 low)."""

import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = os.path.join(REPO, "evidence", "grid_demor4grid_manifest.jsonl")


def effective_key(grid_id, grid=None, _cache={}):
    """Canonical string for the trajectory-relevant resolved config: two grid
    ids with the same key produce bit-identical parameter trajectories (same
    resolved loss gradients, optimizer, model, shuffle). Normalized no-op
    axes: (a) with l_js_kl=0 the JS/KL term is weighted to zero, so
    gamma/epsilon (and the sum/js flags they resolve from) cannot affect
    training; (b) l_collisions scales a gradient-free constant (reference
    utils.py:108 computes the collision term from the PREVIOUS epoch's counts
    under no_grad) — it never changes a gradient, only the logged loss value,
    so the sole trajectory effect it can have is moving the early-stopping
    epoch (stall detection sees the shifted loss); best-PSNR-at-budget is
    identical for runs that did not stop early, which is why e.g. ids
    3842/3862/3882/3902 (l_collisions 1/0.1/0.01/0.001) score identical
    17.082 in the committed r4 manifest."""
    sys.path.insert(0, REPO)
    from collision_handling_in_instantngp_tpu.config import (
        experiment_from_grid_id, get_grid_search_configs,
    )

    if grid is None:
        grid = _cache.setdefault("grid", get_grid_search_configs())
    exp = experiment_from_grid_id(grid_id, grid=grid)
    loss = dataclasses.replace(exp.loss, l_collisions=0.0)
    if loss.l_js_kl == 0:
        loss = dataclasses.replace(loss, gamma=0.0, epsilon=0.0)
    exp = dataclasses.replace(exp, loss=loss, grid_id=-1)
    return json.dumps(dataclasses.asdict(exp), sort_keys=True, default=str)


def main(path=DEFAULT, top_n=15):
    rows = [json.loads(l) for l in open(path)]
    rows.sort(key=lambda r: -r["best_psnr"])
    ref = next((r for r in rows if r["grid_id"] == 4061), None)
    ref_rank = rows.index(ref) + 1 if ref else None
    print(f"configs: {len(rows)}; ids {min(r['grid_id'] for r in rows)}.."
          f"{max(r['grid_id'] for r in rows)}")
    print("| rank | grid id | best PSNR @300ep | stopped early |")
    print("|---|---|---|---|")
    for i, r in enumerate(rows[:top_n], 1):
        mark = " **<- reference's pick**" if r["grid_id"] == 4061 else ""
        print(f"| {i} | {r['grid_id']}{mark} | {r['best_psnr']:.3f} | "
              f"{r['stopped_early']} |")
    if ref and ref_rank > top_n:
        print(f"| {ref_rank} | 4061 **<- reference's pick** | "
              f"{ref['best_psnr']:.3f} | {ref['stopped_early']} |")
    if ref:
        better = [r for r in rows if r["best_psnr"] > ref["best_psnr"]]
        distinct = {}
        for r in better:
            distinct.setdefault(effective_key(r["grid_id"]), r)
        print(f"\n4061 rank {ref_rank}/{len(rows)}; {len(better)} configs "
              f"({len(distinct)} distinct effective configs) beat it at the "
              f"sweep budget")
        return {"better_raw": len(better), "better_distinct": len(distinct),
                "distinct_best_ids": sorted(
                    r["grid_id"] for r in distinct.values())}


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT,
         int(sys.argv[2]) if len(sys.argv) > 2 else 15)
