"""Benchmark: training throughput (pixels/s/chip, fwd+bwd+update) on the
flagship GNGF config (grid id 4061 — the reference README's best run) fitting
strawberry.jpeg, on whatever accelerator JAX exposes (TPU under axon).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pixels/s/chip", "vs_baseline": N}

vs_baseline compares against the committed bench_baseline.json (the first
recorded measurement of this repo's pure-JAX implementation — the reference
publishes no throughput numbers at all, SURVEY.md §6, so this repo establishes
the baseline and then must beat it as kernels improve).
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(REPO, "bench_baseline.json")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--mode", default="gngf",
        choices=["gngf", "gngf-dense", "vanilla", "scaled"],
        help="gngf: flagship fused cfg-4061 (the headline, default); "
             "gngf-dense: unfused oracle path; vanilla: spatial-hash path "
             "(BASELINE config 1); scaled: InstantNGP-scale tables "
             "(BASELINE config 4).",
    )
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument(
        "--span", type=int, default=10,
        help="Epochs per jitted device call (lax.scan over epochs — the "
             "trainer's epoch_span). Amortizes per-call dispatch latency; "
             "1 = one call per epoch (round-1 measurement mode).",
    )
    ap.add_argument(
        "--batch-fraction", type=float, default=None,
        help="Override the per-step batch as a fraction of the image. The "
             "reference trains at 1/3 (params.py:43); scaled mode defaults "
             "to 1/8 (its round-1 HBM concession).",
    )
    ap.add_argument(
        "--precision", default=None,
        choices=[None, "highest", "high", "default"],
        help="Override matmul precision ('default' = fast single-pass "
             "bf16-multiply MXU path, 'high' = 3-pass bf16 (~fp32 "
             "accuracy at ~2x the MXU rate); the headline metric uses "
             "the config's fp32 'highest'). The Pallas HPD kernels "
             "implement 'high' natively as the 3-pass bf16 hi/lo "
             "decomposition (XLA's HIGH algorithm) — measured 40.5 vs "
             "24.5 TF/s for 'highest' on v5e.",
    )
    args = ap.parse_args()

    import jax

    from collision_handling_in_instantngp_tpu.config import (
        experiment_from_grid_id,
        instantngp_scaled_model,
    )
    from collision_handling_in_instantngp_tpu.data import (
        load_image_dataset,
        make_shuffle_permutations,
    )
    from collision_handling_in_instantngp_tpu.models import gngf
    from collision_handling_in_instantngp_tpu.train.train_step import (
        build_epoch_batches,
        make_epoch_fn,
    )

    exp = experiment_from_grid_id(4061)
    if args.mode == "gngf-dense":
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, fused_hpd=False)
        )
    elif args.mode == "vanilla":
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, use_hash_function=True)
        )
    elif args.mode == "scaled":
        # 1/3-image batches = the reference's own batch size (params.py:43).
        # Round 1 ran 1/8 as an HBM concession; the streaming Pallas tail +
        # S-matrix blend (round 2) removed the padded-layout temps that
        # forced it (slot-axis TP across a mesh is the multi-chip answer,
        # parallel/mesh.py). Override with --batch-fraction to compare.
        exp = dataclasses.replace(
            exp,
            model=instantngp_scaled_model(),
            train=dataclasses.replace(exp.train, batch_fraction=1 / 3),
        )
    if args.batch_fraction:
        exp = dataclasses.replace(
            exp,
            train=dataclasses.replace(
                exp.train, batch_fraction=args.batch_fraction
            ),
        )
    if args.precision:
        exp = dataclasses.replace(
            exp,
            model=dataclasses.replace(
                exp.model, matmul_precision=args.precision
            ),
        )
    data = load_image_dataset(os.path.join(REPO, "images", "strawberry.jpeg"))
    statics = gngf.make_statics(exp.model)
    shuffled, _ = make_shuffle_permutations(data.num_pixels, exp.train.seed, True)
    batches = build_epoch_batches(
        data.coords, data.targets, exp.train.batch_fraction, shuffled,
        og_image=data.image, model_cfg=exp.model, statics=statics,
    )

    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(exp.train.seed))
    span = max(1, args.span)
    if span == 1:
        epoch = make_jitted(tx, data.num_pixels)

        def run_one(st):
            st, metrics, _ = epoch(st, batches)
            return st, metrics.loss
    else:
        epoch = make_jitted(tx, data.num_pixels, span=span)

        def run_one(st):
            st, smetrics, _, _, _ = epoch(st, batches)
            return st, smetrics.loss[-1]

    # warmup (compile + cache; axon remote execution is async, so force a
    # device->host transfer — block_until_ready alone does not drain the tunnel)
    for _ in range(3):
        state, loss = run_one(state)
        float(loss)

    n_calls = max(1, args.epochs // span)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, loss = run_one(state)
    float(loss)  # forces the whole dependent chain
    dt = time.perf_counter() - t0
    n_epochs = n_calls * span

    n_chips = max(len(jax.devices()), 1)
    pixels_per_s_per_chip = n_epochs * data.num_pixels / dt / n_chips

    # vs_baseline is only meaningful for the headline metric
    baseline = None
    if args.mode == "gngf" and os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f).get("pixels_per_s_per_chip")
    vs_baseline = (
        pixels_per_s_per_chip / baseline if baseline else 1.0
    )

    metric_names = {
        "gngf": "gngf_train_throughput_strawberry_cfg4061",
        "gngf-dense": "gngf_dense_train_throughput_strawberry_cfg4061",
        "vanilla": "vanilla_hash_train_throughput_strawberry",
        "scaled": "scaled_T16k_L16_train_throughput_strawberry",
    }
    # span/mode/precision make BENCH_r*.json self-describing — BENCH_r01
    # measured span=1 and BENCH_r02 span=10, so cross-round comparisons need
    # the measurement mode recorded in the artifact itself (VERDICT r2 #7/#9)
    print(json.dumps({
        "metric": metric_names[args.mode],
        "value": round(pixels_per_s_per_chip, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "mode": args.mode,
        "span": span,
        "precision": exp.model.matmul_precision,
        "batch_fraction": round(exp.train.batch_fraction, 6),
    }))


if __name__ == "__main__":
    main()
