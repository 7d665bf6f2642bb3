"""Cold-start PSNR protocol (VERDICT round-1 item 2): ONE from-scratch run per
seed, tolerance=inf (the reference's early stopper is de-facto disabled by its
uninitialized-buffer loss noise — RESULTS.md), 5000-epoch budget, config 4061
on strawberry.jpeg. Prints one JSON summary line per seed.

--scaled swaps in the InstantNGP-scale model (T=2^14, L=16 — BASELINE
config 4) with the same 4061 training recipe at the reference's 1/3 batches,
for a quality demonstration of the scaled-table path.

Usage: python tools/run_cold.py [epochs] [seed ...] [--precision=P] [--scaled]
                                [--encoding_lr=LR] [--l_js_kl=W]
                                [--l_collisions=W] [--no_hist]

--no_hist disables histogram epochs (histograms_rate=10^9): at the scaled
geometry (L=16, T=2^14) each histogram epoch pays a singleton device call +
cell-table statistics + 16 matplotlib figures — ~3s of wall per occurrence
that the quality studies don't need (the r3 scaled run spent most of its
3.7 s/epoch average there; spans train at ~0.63 s/epoch).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
from collision_handling_in_instantngp_tpu.data import load_image_dataset
from collision_handling_in_instantngp_tpu.train.trainer import fit
from collision_handling_in_instantngp_tpu.utils.logging import JsonlLogger


def main(epochs, seeds, precision=None, scaled=False, encoding_lr=None,
         l_js_kl=None, l_collisions=None, no_hist=False,
         image="strawberry.jpeg"):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = load_image_dataset(os.path.join(repo, "images", image))
    stem = os.path.splitext(image)[0]
    tag = "" if not precision else f"_{precision}"
    if scaled:
        tag += "_scaled"
    if encoding_lr is not None:
        tag += f"_elr{encoding_lr:g}"
    if l_js_kl is not None:
        tag += f"_jskl{l_js_kl:g}"
    if l_collisions is not None:
        tag += f"_lcoll{l_collisions:g}"
    for seed in seeds:
        exp = experiment_from_grid_id(4061)
        exp = dataclasses.replace(
            exp,
            train=dataclasses.replace(exp.train, tolerance=10**9, seed=seed),
        )
        if scaled:
            from collision_handling_in_instantngp_tpu.config import (
                instantngp_scaled_model,
            )

            exp = dataclasses.replace(
                exp,
                model=instantngp_scaled_model(),
                train=dataclasses.replace(exp.train, batch_fraction=1 / 3),
            )
        if precision:
            exp = dataclasses.replace(
                exp,
                model=dataclasses.replace(
                    exp.model, matmul_precision=precision
                ),
            )
        if encoding_lr is not None:
            # the 4061 recipe's table LR (1e-4, reference params.py:37) was
            # tuned for T=2^8; InstantNGP-scale tables train with ~1e-2
            exp = dataclasses.replace(
                exp,
                optimizer=dataclasses.replace(
                    exp.optimizer, encoding_lr=encoding_lr
                ),
            )
        if l_js_kl is not None or l_collisions is not None:
            # scaled-table regularizer controls: at T=2^14 the uniformity
            # prior spreads mass over 16,384 slots — a very different
            # regularizer than at the 4061 recipe's T=2^8
            loss = exp.loss
            if l_js_kl is not None:
                loss = dataclasses.replace(loss, l_js_kl=l_js_kl)
            if l_collisions is not None:
                loss = dataclasses.replace(loss, l_collisions=l_collisions)
            exp = dataclasses.replace(exp, loss=loss)
        if no_hist:
            exp = dataclasses.replace(
                exp,
                train=dataclasses.replace(exp.train, histograms_rate=10**9),
            )
        res = fit(
            exp, data,
            epochs=epochs,
            logger=JsonlLogger(
                f"runs/{stem}_4061_cold_seed{seed}{tag}.jsonl"
            ),
            collect_history=False,
            verbose=True,
            run_name=f"cold_{stem}_seed{seed}{tag}"
            if stem != "strawberry" else f"cold_seed{seed}{tag}",
            epoch_span=33,  # 33 | 99 (=rate-1): only two compiled variants
        )
        print(json.dumps({
            "image": image, "grid_id": 4061, "seed": seed,
            "precision": precision or "highest", "scaled": scaled,
            "epochs": res.epochs_run, "best_psnr": round(res.best_psnr, 4),
            "final_psnr": round(res.final_psnr, 4),
            "final_loss": round(res.final_loss, 6), "run_dir": res.run_dir,
        }), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    precision = None
    encoding_lr = None
    l_js_kl = None
    l_collisions = None
    image = "strawberry.jpeg"
    for a in sys.argv[1:]:
        if a.startswith("--precision="):
            precision = a.split("=", 1)[1]
        elif a.startswith("--image="):
            image = a.split("=", 1)[1]
        elif a.startswith("--encoding_lr="):
            encoding_lr = float(a.split("=", 1)[1])
        elif a.startswith("--l_js_kl="):
            l_js_kl = float(a.split("=", 1)[1])
        elif a.startswith("--l_collisions="):
            l_collisions = float(a.split("=", 1)[1])
    epochs = int(args[0]) if args else 5000
    seeds = [int(s) for s in args[1:]] or [65535]
    main(epochs, seeds, precision, scaled="--scaled" in sys.argv[1:],
         encoding_lr=encoding_lr, l_js_kl=l_js_kl, l_collisions=l_collisions,
         no_hist="--no_hist" in sys.argv[1:], image=image)
