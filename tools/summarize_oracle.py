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
import gzip
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _open(path):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def best_at_budget(path, budget):
    best = None
    epochs = 0
    with _open(path) as fh:
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
    """Yield (seed, best_psnr_at_budget) if this per-seed reference console
    log is complete at the budget. The seed comes from the FILENAME
    (reference_cold_seed{S}[_e{E}].log — one run per file by construction of
    r4_oracle.sh/r5_oracle.sh); the in-log 'Random seed:' banner is only a
    sanity check, because the reference's functions.py hardcodes
    random_seed=2**16-1 at import time and every banner therefore reads
    65535 regardless of the seed actually trained (ADVICE r4 medium)."""
    m = re.search(r"reference_cold_seed(\d+)(?:_e\d+)?\.log$", logpath)
    if not m:
        return
    seed = int(m.group(1))
    text = open(logpath, errors="replace").read()
    best, max_epoch = None, 0
    for m in re.finditer(
        r"Training_psnr: ([0-9.]+)[^|]*\|[^|]*\| (\d+)/\d+", text
    ):
        psnr, epoch = float(m.group(1)), int(m.group(2))
        max_epoch = max(max_epoch, epoch)
        if epoch <= budget and (best is None or psnr > best):
            best = psnr
    if best is not None and max_epoch >= budget:
        yield seed, best


def main(budget=450):
    ref = {}
    # Primary sources: per-epoch JSONLs from tools/run_reference_cold.py
    # (live in runs/, committed gzipped in evidence/).
    for path in sorted(
        glob.glob(os.path.join(REPO, "runs", "reference_cold_seed*.jsonl"))
        + glob.glob(
            os.path.join(REPO, "evidence", "reference_cold_seed*.jsonl.gz")
        )
    ):
        m = re.search(r"seed(\d+)(?:_e\d+)?\.jsonl(?:\.gz)?$", path)
        if not m:
            continue
        seed = int(m.group(1))
        if seed in ref:
            continue
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
            if (
                row.get("epoch_budget") == budget
                and row.get("epochs_run", 0) >= budget
                and row["seed"] not in ref
            ):
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

    # Rebuild-side fallback when per-epoch histories are gone (runs/ is
    # wiped between sessions): the campaign logs keep one summary JSON line
    # per cold run with the exact best at its epoch budget.
    rebuild_summary = {}
    for logname in ("hw_r5_campaign.log", "hw_r5_queue.log"):
        p = os.path.join(REPO, "evidence", logname)
        if not os.path.exists(p):
            continue
        for line in open(p, errors="replace"):
            line = line.strip()
            if not line.startswith('{"image"'):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if (
                row.get("image") == "strawberry.jpeg"
                and not row.get("scaled")
                and row.get("epochs") == budget
            ):
                rebuild_summary.setdefault(row["seed"], row["best_psnr"])

    rows = []
    for seed, rbest in sorted(ref.items()):
        obest = None
        for ours_path in (
            os.path.join(REPO, "runs", f"strawberry_4061_cold_seed{seed}.jsonl"),
        ) + tuple(sorted(glob.glob(os.path.join(
            REPO, "evidence", f"rebuild_cold*_seed{seed}.jsonl.gz"
        )))):
            if not os.path.exists(ours_path):
                continue
            obest, oe = best_at_budget(ours_path, budget)
            if oe < budget:
                obest = None
            if obest is not None:
                break
        if obest is None and seed in rebuild_summary:
            obest = rebuild_summary[seed]
        rows.append({"seed": seed, "reference": round(rbest, 3),
                     "rebuild": round(obest, 3) if obest is not None else None})
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
    # Welch t restricted to seeds present in BOTH implementations (ADVICE
    # r4 low: mixing all reference seeds with only-paired rebuild seeds
    # reports a non-matched comparison alongside a paired mean diff).
    paired_rows = [r for r in rows if r["rebuild"] is not None]
    if len(paired_rows) > 1:
        pr = np.array([r["reference"] for r in paired_rows], dtype=np.float64)
        po = np.array([r["rebuild"] for r in paired_rows], dtype=np.float64)
        se = np.sqrt(pr.var(ddof=1) / len(pr) + po.var(ddof=1) / len(po))
        out["welch_t_rebuild_minus_ref"] = round(
            float((po.mean() - pr.mean()) / se), 2
        )
        out["n_paired"] = len(paired_rows)
        out["paired_diff_mean"] = round(float((po - pr).mean()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 450)
