"""Run the UPSTREAM REFERENCE itself (torch, CPU) under the cold-seed
protocol to measure ITS best-PSNR seed distribution (VERDICT r2 #7).

The published 20.331 PSNR (reference README) is ONE run at one seed. Our
rebuild's 20-seed cold study centers ~20.1; before chasing more "parity"
(init distributions already match — tests/test_init_parity.py), measure what
distribution the reference's own code produces under the same budget. This
harness imports /root/reference VERBATIM (no code copied into the framework;
this is an experiment driver, like the torch oracle in
tests/test_model_parity_torch.py) with three environment shims:

  * wandb       -> recording stub (captures per-epoch train_psnr; the real
                   package is not installed here)
  * torchvision -> empty stub (imported by functions.py, unused on this path)
  * cuda        -> cpu (torch here is CPU-only; fp32 matmul math, same
                   accuracy class as the reference's fp32 CUDA)

Reference behaviors exercised verbatim: grid_search_loop + train_step
(functions.py:477-818), model/loss/stopper (models.py, utils.py), including
its own EarlyStopping(tolerance=500) protocol that produced the published
number.

Usage: python tools/run_reference_cold.py [epochs] [seed ...]
Prints one JSON line per seed; per-epoch logs in
runs/reference_cold_seed{S}.jsonl; weights go to a temp dir (discarded).
"""

import json
import os
import sys
import tempfile
import time
import types

os.environ.setdefault("MPLBACKEND", "Agg")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _install_stubs(log_rows):
    import matplotlib.pyplot as plt

    wandb = types.ModuleType("wandb")

    class _Image:  # noqa: D401 - stub
        def __init__(self, obj, caption=None):
            # close histogram figures immediately: the reference hands them
            # to wandb.Image and never plt.close()s, which leaks over 5000
            # epochs on an Agg backend
            import matplotlib.figure

            if isinstance(obj, matplotlib.figure.Figure):
                plt.close(obj)

    def _log(row):
        log_rows.append(
            {
                k: (float(v) if isinstance(v, (int, float)) else None)
                for k, v in row.items()
                if k in ("train_loss", "train_psnr", "mse_loss")
            }
        )

    wandb.Image = _Image
    wandb.init = lambda *a, **k: None
    wandb.log = _log
    wandb.finish = lambda *a, **k: None
    sys.modules["wandb"] = wandb

    tv = types.ModuleType("torchvision")
    tv.io = types.ModuleType("torchvision.io")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.io"] = tv.io
    sys.modules["torchvision.transforms"] = tv.transforms


def _patch_torch_cpu():
    """Route the reference's module-level `torch.set_default_device(cuda)`
    to cpu (torch here is CPU-only). The `device` module-global the reference
    threads through `from functions import *` is rewritten post-import in
    main() — shadowing torch.device itself breaks `str | torch.device`
    annotations all over torch."""
    import torch

    real_set = torch.set_default_device

    def set_default_device(dev):
        if str(dev).startswith("cuda"):
            dev = torch.device("cpu")
        return real_set(dev)

    torch.set_default_device = set_default_device

    # torch.unique(dim=0) on CPU is pathologically slow (>60 s per call at
    # the reference's ~230K x 2 vertex arrays; it is only used to COUNT
    # unique rows, models.py:581,600). Route the dim!=None, values-only form
    # through np.unique (identical cardinality, deterministic).
    import numpy as np

    real_unique = torch.unique

    def unique(input, sorted=True, return_inverse=False,
               return_counts=False, dim=None):
        if dim == 0 and not return_inverse and not return_counts:
            arr = np.ascontiguousarray(input.detach().cpu().numpy())
            if arr.ndim == 1:
                # np.unique(axis=0) on 1-D falls back to a VOID-dtype sort
                # (memcmp comparisons, ~20x slower than a native int sort);
                # the dtype-native path is exact
                u = np.unique(arr)
                return torch.from_numpy(u)
            if arr.ndim == 2 and np.issubdtype(arr.dtype, np.integer):
                # pack rows into one int64 key: 1-D unique is a cheap sort
                # (the reference only reads .shape[0] of these results)
                a = arr.astype(np.int64)
                lo, hi = a.min(axis=0), a.max(axis=0)
                key = np.zeros(a.shape[0], dtype=np.int64)
                for c in range(a.shape[1]):
                    key = key * (hi[c] - lo[c] + 1) + (a[:, c] - lo[c])
                u = np.unique(key)
                return torch.empty((u.shape[0],) + arr.shape[1:],
                                   dtype=input.dtype)
            u = np.unique(arr, axis=0)
            return torch.from_numpy(u)
        return real_unique(input, sorted=sorted, return_inverse=return_inverse,
                           return_counts=return_counts, dim=dim)

    torch.unique = unique


def main(epochs, seeds):
    log_rows = []
    _install_stubs(log_rows)
    _patch_torch_cpu()
    sys.path.insert(0, REFERENCE)

    import torch

    import functions  # noqa: E402  (reference module, seeds torch at import)

    cpu = torch.device("cpu")
    functions.device = cpu  # models/utils re-import this global below

    import models as ref_models  # noqa: E402
    import utils as ref_utils  # noqa: E402

    ref_models.device = cpu
    ref_utils.device = cpu

    from functions import get_grid_search_configs, grid_search_loop
    from models import GeneralNeuralGaugeFields  # noqa: E402
    from params import grid_search_configs, should_batchnorm_data  # noqa: E402
    from utils import EarlyStopping, Loss, MyDataset  # noqa: E402

    functions.epochs = epochs  # module-global read by grid_search_loop

    configs = get_grid_search_configs(configs=grid_search_configs)
    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)

    for seed in seeds:
        torch.manual_seed(seed)  # repeat the import-time seeding per seed

        dataset = MyDataset(
            root=REFERENCE, dir_name="images", image_name="strawberry.jpeg"
        )
        x, y, h, w = dataset[0]
        if not should_batchnorm_data:
            x = x / (max(w, h) - 1)
        og_img = dataset.get_image()
        shape = w * h
        shuffled_indices = torch.randperm(shape).int()
        reordered_indices = torch.zeros((shape,)).int()
        reordered_indices[shuffled_indices] = torch.arange(shape).int()

        log_rows.clear()
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as td:
            grid_search_loop(
                filtered_grid_search=configs,
                x=x,
                y=y,
                w=w,
                h=h,
                image_name="strawberry",
                og_image=og_img,
                shuffled_indices=shuffled_indices,
                reordered_indices=reordered_indices,
                GeneralNeuralGaugeFields=GeneralNeuralGaugeFields,
                Loss=Loss,
                EarlyStopping=EarlyStopping,
                start_id_param=4061,
                end_id_param=4062,
                is_test_only=False,  # wandb stub records; test path leaks figs
                wandb_name="ref_cold",
                drive_folder=td,
            )
        dt = time.perf_counter() - t0

        rows = list(log_rows)
        with open(
            os.path.join(REPO, "runs", f"reference_cold_seed{seed}.jsonl"), "w"
        ) as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        psnrs = [r["train_psnr"] for r in rows if r.get("train_psnr")]
        print(
            json.dumps(
                {
                    "impl": "reference(torch-cpu)",
                    "image": "strawberry.jpeg",
                    "grid_id": 4061,
                    "seed": seed,
                    "epochs_run": len(rows),
                    "epoch_budget": epochs,
                    "best_psnr": round(max(psnrs), 4),
                    "final_psnr": round(psnrs[-1], 4),
                    "wall_s": round(dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    epochs = int(args[0]) if args else 5000
    seeds = [int(a) for a in args[1:]] or [65535]
    main(epochs, seeds)
