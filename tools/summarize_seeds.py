"""Multi-seed distribution table for the scaled T=2^14/L=16 elr=0.01 recipe
(VERDICT r4 #2: "give the 20.801 headline a distribution").

Reads every runs/ or evidence/ per-epoch history matching the recipe tag,
prints one row per seed (best PSNR, best epoch, final PSNR, epochs run) and
the mean ± std, next to the committed comparison anchors:

  flagship 20-seed cold study  : 20.121 ± 0.385 (RESULTS round-3)
  reference published (README) : 20.331 (single run, unknown seed)

Usage: python tools/summarize_seeds.py [--tag _scaled_elr0.01] [--image stem]
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


def run_stats(path):
    best, best_e, last, last_e = None, None, None, -1
    with _open(path) as fh:
        for line in fh:
            r = json.loads(line)
            p = r.get("train_psnr")
            if p is None:
                continue
            if best is None or p > best:
                best, best_e = p, r["step"]
            if r["step"] > last_e:
                last, last_e = p, r["step"]
    return best, best_e, last, last_e + 1


def main(tag="_scaled_elr0.01", image="strawberry"):
    pat = re.compile(
        rf"{re.escape(image)}_4061_cold_seed(\d+){re.escape(tag)}"
        r"\.jsonl(?:\.gz)?$"
    )
    rows = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "runs", "*.jsonl"))
        + glob.glob(os.path.join(REPO, "evidence", "*.jsonl.gz"))
    ):
        m = pat.search(os.path.basename(path))
        if not m:
            continue
        seed = int(m.group(1))
        if seed in rows:
            continue
        best, best_e, last, n = run_stats(path)
        if best is None:
            continue
        rows[seed] = {"seed": seed, "best_psnr": round(best, 4),
                      "best_epoch": best_e, "final_psnr": round(last, 4),
                      "epochs": n}
    for seed in sorted(rows):
        print(json.dumps(rows[seed]))
    bests = np.array([r["best_psnr"] for r in rows.values()])
    # span-boundary flushes can leave the harvested history one epoch short
    # of the nominal budget (e.g. 4999 rows for a 5,000-epoch run)
    complete = [r for r in rows.values() if r["epochs"] >= 4950]
    out = {
        "tag": tag, "image": image, "n": len(bests),
        "n_complete_5000": len(complete),
        "mean": round(float(bests.mean()), 3) if len(bests) else None,
        "std": round(float(bests.std(ddof=1)), 3) if len(bests) > 1 else None,
        "min": round(float(bests.min()), 3) if len(bests) else None,
        "max": round(float(bests.max()), 3) if len(bests) else None,
        "anchors": {"flagship_20seed": "20.121 +/- 0.385",
                    "published_reference": 20.331},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--tag"):
            kw["tag"] = a.split("=", 1)[1]
        elif a.startswith("--image"):
            kw["image"] = a.split("=", 1)[1]
    main(**kw)
