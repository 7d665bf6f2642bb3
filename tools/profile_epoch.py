"""Capture a jax.profiler trace of training epochs on the current accelerator.

Usage:
    python tools/profile_epoch.py [--epochs 3] [--logdir /tmp/jax-trace]
                                  [--mode gngf|gngf-dense|vanilla|scaled]

Open the trace in TensorBoard (profile plugin) or Perfetto to see the
per-kernel timeline and HBM traffic.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/jax-trace")
    ap.add_argument(
        "--mode", default="gngf",
        choices=["gngf", "gngf-dense", "vanilla", "scaled"],
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
        exp = dataclasses.replace(exp, model=instantngp_scaled_model())

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))
    statics = gngf.make_statics(exp.model)
    shuffled, _ = make_shuffle_permutations(data.num_pixels, 65535, True)
    batches = build_epoch_batches(
        data.coords, data.targets, exp.train.batch_fraction, shuffled,
        og_image=data.image, model_cfg=exp.model, statics=statics,
    )
    init_state, make_jitted = make_epoch_fn(exp, statics)
    state, tx = init_state(jax.random.PRNGKey(65535))
    epoch = make_jitted(tx, data.num_pixels)

    # warm up (compile)
    for _ in range(2):
        state, metrics, _ = epoch(state, batches)
        float(metrics.loss)

    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        state, metrics, _ = epoch(state, batches)
    float(metrics.loss)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(
        f"traced {args.epochs} epochs in {dt:.3f}s "
        f"({args.epochs * data.num_pixels / dt:.0f} px/s) -> {args.logdir}"
    )


if __name__ == "__main__":
    main()
