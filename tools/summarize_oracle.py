"""Reference-oracle vs rebuild: same-seed/same-budget best-PSNR comparison
(VERDICT r3 #3 — close the "is published 20.331 a +0.5σ draw?" question).

Reads runs/reference_cold_seed{S}.jsonl (the UPSTREAM torch code run on CPU
by tools/run_reference_cold.py under the cold protocol) and the rebuild's
runs/strawberry_4061_cold_seed{S}.jsonl, truncates BOTH to the same epoch
budget (the reference's CPU runs stop at 450), and prints per-seed bests +
distribution statistics.

Usage: python tools/summarize_oracle.py [budget=450]
"""

import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_at_budget(path, budget):
    best = None
    epochs = 0
    with open(path) as fh:
        for i, line in enumerate(fh):
            row = json.loads(line)
            # reference logs have no step key: rows are epoch-ordered
            step = row.get("step", row.get("epoch", i))
            if step >= budget:
                continue
            epochs = max(epochs, step + 1)
            p = row.get("train_psnr")
            if p is not None and (best is None or p > best):
                best = p
    return best, epochs


def tqdm_bests(logpath, budget):
    """Yield (seed, best_psnr_at_budget) for each complete-at-budget run in a
    reference console log (which may hold several runs back to back)."""
    text = open(logpath, errors="replace").read()
    # split into per-run chunks on the seed banner
    chunks = re.split(r"Random seed: (\d+)", text)
    for i in range(1, len(chunks) - 1, 2):
        seed, body = int(chunks[i]), chunks[i + 1]
        best, max_epoch = None, 0
        for m in re.finditer(
            r"Training_psnr: ([0-9.]+)[^|]*\|[^|]*\| (\d+)/\d+", body
        ):
            psnr, epoch = float(m.group(1)), int(m.group(2))
            max_epoch = max(max_epoch, epoch)
            if epoch <= budget and (best is None or psnr > best):
                best = psnr
        if best is not None and max_epoch >= budget:
            yield seed, best


def main(budget=450):
    ref = {}
    # Primary source: per-epoch JSONLs from tools/run_reference_cold.py.
    for path in sorted(glob.glob(os.path.join(REPO, "runs", "reference_cold_seed*.jsonl"))):
        m = re.search(r"seed(\d+)\.jsonl$", path)
        if not m:
            continue
        seed = int(m.group(1))
        best, epochs = best_at_budget(path, budget)
        if best is not None and epochs >= budget:
            ref[seed] = best
    # Fallback: summary JSON lines preserved in the committed evidence log
    # (the per-epoch runs/ files are gitignored and were wiped between
    # rounds; the summaries carry the exact best_psnr at the same budget).
    ev = os.path.join(REPO, "evidence", "reference_cold_cpu.log")
    if os.path.exists(ev):
        for line in open(ev):
            line = line.strip()
            if not line.startswith('{"impl": "reference'):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("epoch_budget") == budget and row["seed"] not in ref:
                ref[row["seed"]] = row["best_psnr"]
    # Last resort, any budget: the reference's tqdm bar text embeds the
    # per-epoch Training_psnr next to the epoch counter; parse the committed
    # console logs. The psnr<->epoch pairing is off by at most one epoch
    # (the bar redraws before and after the increment), which cannot change
    # a best-so-far by more than one epoch's worth of PSNR movement.
    for logpath in sorted(
        glob.glob(os.path.join(REPO, "evidence", "reference_cold_*.log"))
    ):
        for seed, best in tqdm_bests(logpath, budget):
            ref.setdefault(seed, best)

    rows = []
    for seed, rbest in sorted(ref.items()):
        ours_path = os.path.join(
            REPO, "runs", f"strawberry_4061_cold_seed{seed}.jsonl"
        )
        obest = None
        if os.path.exists(ours_path):
            obest, oe = best_at_budget(ours_path, budget)
            if oe < budget:
                obest = None
        rows.append({"seed": seed, "reference": round(rbest, 3),
                     "rebuild": round(obest, 3) if obest else None})
        print(json.dumps(rows[-1]))

    rvals = np.array([r["reference"] for r in rows], dtype=np.float64)
    ovals = np.array(
        [r["rebuild"] for r in rows if r["rebuild"] is not None],
        dtype=np.float64,
    )
    out = {
        "budget_epochs": budget,
        "n_ref": len(rvals),
        "ref_mean": round(float(rvals.mean()), 3) if len(rvals) else None,
        "ref_std": round(float(rvals.std(ddof=1)), 3) if len(rvals) > 1 else None,
        "n_rebuild": len(ovals),
        "rebuild_mean": round(float(ovals.mean()), 3) if len(ovals) else None,
        "rebuild_std": (
            round(float(ovals.std(ddof=1)), 3) if len(ovals) > 1 else None
        ),
    }
    if len(rvals) > 1 and len(ovals) > 1:
        # Welch t on the paired-seed samples (small n — indicative, not
        # decisive; the honest statement quotes both distributions)
        se = np.sqrt(rvals.var(ddof=1) / len(rvals) + ovals.var(ddof=1) / len(ovals))
        out["welch_t_rebuild_minus_ref"] = round(
            float((ovals.mean() - rvals.mean()) / se), 2
        )
        paired = [
            (r["rebuild"] - r["reference"]) for r in rows
            if r["rebuild"] is not None
        ]
        out["paired_diff_mean"] = round(float(np.mean(paired)), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 450)
