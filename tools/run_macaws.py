"""BASELINE.json config 3: GNGF fits of macaw.jpg + macaw2.jpg (generalization
across images with the cfg-4061 recipe). Writes per-epoch logs and prints a
summary row per image."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.data import load_image_dataset
from collision_handling_in_instantngp_tpu.train.trainer import fit
from collision_handling_in_instantngp_tpu.utils.logging import JsonlLogger


def main(epochs=1500):
    exp = experiment_from_grid_id(4061)
    exp = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, tolerance=10**9)
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("macaw.jpg", "macaw2.jpg"):
        data = load_image_dataset(os.path.join(repo, "images", name))
        stem = os.path.splitext(name)[0]
        res = fit(
            exp, data,
            epochs=epochs,
            logger=JsonlLogger(f"runs/{stem}_4061.jsonl"),
            collect_history=False,
            verbose=True,
            epoch_span=33,
        )
        print(json.dumps({
            "image": name, "pixels": data.num_pixels, "epochs": res.epochs_run,
            "best_psnr": round(res.best_psnr, 4),
            "final_loss": round(res.final_loss, 6),
            "run_dir": res.run_dir,
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
