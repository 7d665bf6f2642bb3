"""Scaled-table quality study summary (VERDICT r3 #2).

Reads every runs/strawberry_4061_cold_seed{S}_scaled*.jsonl variant and
prints per-run: best/final PSNR, best epoch, epochs run, and late-training
per-level collision totals (mean of the last 100 epochs, first/middle/last
level) — the diagnosis data for WHY a variant fits better or worse. The
flagship same-seed run is printed first as the comparison bar.

Usage: python tools/summarize_scaled.py [seed=65535]
"""

import glob
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def summarize(path):
    rows = [json.loads(l) for l in open(path)]
    if not rows:
        return None
    psnr = np.array([r["train_psnr"] for r in rows])
    best_i = int(psnr.argmax())
    lvls = sorted(
        int(m.group(1))
        for m in (re.match(r"collisions_level(\d+)$", k) for k in rows[-1])
        if m
    )
    tail = rows[-100:]
    coll = {
        f"L{l}": round(
            float(np.mean([r.get(f"collisions_level{l}", np.nan) for r in tail])), 1
        )
        for l in (lvls[:1] + lvls[len(lvls) // 2 : len(lvls) // 2 + 1] + lvls[-2:])
    }
    return {
        "run": os.path.basename(path),
        "epochs": len(rows),
        "best_psnr": round(float(psnr[best_i]), 3),
        "best_epoch": int(rows[best_i].get("step", best_i)),
        "final_psnr": round(float(psnr[-1]), 3),
        "late_collisions": coll,
    }


def main(seed=65535):
    flag = os.path.join(REPO, "runs", f"strawberry_4061_cold_seed{seed}.jsonl")
    if os.path.exists(flag):
        print(json.dumps({"FLAGSHIP": summarize(flag)}))
    for path in sorted(
        glob.glob(
            os.path.join(REPO, "runs", f"strawberry_4061_cold_seed{seed}_scaled*.jsonl")
        )
    ):
        s = summarize(path)
        if s:
            print(json.dumps(s))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 65535)
