"""Mechanism study for the scaled-quality result (VERDICT r4 #1): which loss
term does the work?

Modes:
  --diff FULL.jsonl ARM.jsonl
      Per-epoch comparison of two runs' PSNR/MSE/collision trajectories.
      For the l_collisions=0 arm vs the full run this is the INERTNESS
      CHECK: the collision-loss term is a gradient-free constant (reference
      utils.py:108 computes it from the previous epoch's counts under
      no_grad; train/loss.py mirrors that), so zeroing its weight must leave
      the parameter trajectory bit-identical — the only allowed difference
      is the logged total loss, which drops by exactly the constant.
  --curves RUN.jsonl [RUN.jsonl ...]
      Per-level marginal-vs-uniform divergence curves over training: the
      logged kl_div_loss_level{l} IS the unweighted js_kl divergence
      functional (train/loss.py logs it before weighting), so the control
      (l_js_kl=0) logs what its UNREGULARIZED marginal drifts to while the
      full run logs what the prior holds it at. Also tabulates
      collisions_level{l} at the same epochs (the collision counts the
      thesis is about).

Gzipped evidence paths work everywhere a jsonl path is accepted.
"""

import gzip
import json
import os
import sys

import numpy as np


def _open(path):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def load(path):
    with _open(path) as fh:
        return [json.loads(l) for l in fh]


def diff(full_path, arm_path):
    full = {r["step"]: r for r in load(full_path)}
    arm = {r["step"]: r for r in load(arm_path)}
    common = sorted(set(full) & set(arm))
    out = {
        "full": os.path.basename(full_path),
        "arm": os.path.basename(arm_path),
        "epochs_compared": len(common),
    }
    for key in ("train_psnr", "mse_loss"):
        d = np.array([
            abs(full[s][key] - arm[s][key]) for s in common
            if key in full[s] and key in arm[s]
        ])
        out[f"max_abs_diff_{key}"] = float(d.max()) if len(d) else None
        out[f"n_equal_{key}"] = int((d == 0.0).sum())
        out[f"n_{key}"] = len(d)
    # collision counts come from the previous epoch's selected indices —
    # identical trajectories must produce identical counts at every level
    coll_keys = sorted(
        k for k in next(iter(full.values()))
        if k.startswith("collisions_level")
    )
    coll_equal = all(
        full[s][k] == arm[s][k]
        for s in common for k in coll_keys
        if k in full[s] and k in arm[s]
    )
    out["collision_counts_identical"] = bool(coll_equal)
    # the total loss must differ by exactly the dropped constant:
    # l_collisions * sum_l collisions_loss_level{l} as logged by the FULL run
    # (collisions_loss_level{l} = coll/(min_possible+delta), utils.py:108)
    closs_keys = sorted(
        k for k in next(iter(full.values()))
        if k.startswith("collisions_loss_level")
    )
    resid = []
    for s in common:
        if not all(k in full[s] for k in closs_keys):
            continue
        const = sum(full[s][k] for k in closs_keys)
        # full run weighted it by its l_collisions (4061: 1e-3)
        resid.append(
            (full[s]["train_loss"] - arm[s]["train_loss"]) - 1e-3 * const
        )
    out["loss_delta_minus_constant_max"] = (
        float(np.abs(resid).max()) if resid else None
    )
    return out


def curves(paths, levels=(0, 7, 14, 15), epochs=None):
    table = {}
    for p in paths:
        rows = {r["step"]: r for r in load(p)}
        steps = sorted(rows)
        if epochs is None:
            last = steps[-1]
            epochs = [0, 249, 499, 999, 1999, 2999, 3999, last]
            epochs = sorted({min(e, last) for e in epochs})
        name = os.path.basename(p).replace(".jsonl", "").replace(".gz", "")
        for e in epochs:
            # rows key on the REQUESTED epoch so runs of different lengths
            # align; the matched step is recorded when it differs
            s = min(steps, key=lambda t: abs(t - e))
            r = rows[s]
            for l in levels:
                table.setdefault((l, e), {})[name] = {
                    "js_kl_div": r.get(f"kl_div_loss_level{l}"),
                    "collisions": r.get(f"collisions_level{l}"),
                    "step": s if s != e else None,
                }
    return table


def print_curves(table):
    names = sorted({n for v in table.values() for n in v})
    print("| level | epoch | " + " | ".join(
        f"{n} div / coll" for n in names) + " |")
    print("|" + "---|" * (2 + len(names)))
    for (l, s) in sorted(table):
        cells = []
        for n in names:
            e = table[(l, s)].get(n)
            if e is None or e["js_kl_div"] is None:
                cells.append("—")
            else:
                c = e["collisions"]
                cell = (
                    f"{e['js_kl_div']:.3e} / "
                    + (f"{c:,.0f}" if c is not None else "—")
                )
                if e["step"] is not None and abs(e["step"] - s) > 50:
                    cell += f" (@{e['step']})"
                cells.append(cell)
        print(f"| L{l} | {s} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--diff":
        print(json.dumps(diff(args[1], args[2]), indent=1))
    elif args and args[0] == "--curves":
        print_curves(curves(args[1:]))
    else:
        print(__doc__)
