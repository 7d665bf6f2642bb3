"""Summarize a training-run JSONL log: best/final PSNR, loss, epochs, curve
checkpoints. Usage: python tools/summarize_run.py runs/strawberry_4061.jsonl"""

import json
import sys


def summarize(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    best = max(rows, key=lambda r: r["train_psnr"])
    curve = {
        e: round(rows[e]["train_psnr"], 3)
        for e in [0, 99, 499, 999, 1999, 2999, 3999, len(rows) - 1]
        if e < len(rows)
    }
    return {
        "log": path,
        "epochs": len(rows),
        "best_psnr": round(best["train_psnr"], 4),
        "best_epoch": best["step"],
        "final_psnr": round(rows[-1]["train_psnr"], 4),
        "final_loss": round(rows[-1]["train_loss"], 6),
        "final_mse": round(rows[-1]["mse_loss"], 6),
        "psnr_curve": curve,
    }


if __name__ == "__main__":
    for path in sys.argv[1:]:
        print(json.dumps(summarize(path), indent=2))
