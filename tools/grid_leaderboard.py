"""PSNR leaderboard for a grid-sweep manifest (VERDICT r3 #7: report
whether any config beats the reference's chosen 4061 under the sweep's
budget). Usage: python tools/grid_leaderboard.py runs/grid_demor4grid_manifest.jsonl [top_n]"""

import json
import sys


def main(path, top_n=15):
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
    better = sum(1 for r in rows if ref and r["best_psnr"] > ref["best_psnr"])
    if ref:
        print(f"\n4061 rank {ref_rank}/{len(rows)}; {better} configs beat "
              f"it at the 300-epoch budget")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 15)
