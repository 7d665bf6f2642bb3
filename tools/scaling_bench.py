"""DP scaling-efficiency harness (BASELINE target: >=80% pixels/s efficiency
from 1 chip to an N-chip/N-host mesh).

On real multi-chip hardware this reports pixels/s at each mesh size and the
efficiency vs linear scaling. Only one real chip is attached in this
development environment, so ``--platform cpu`` runs the same harness on
virtual CPU devices — that validates the sharded program end-to-end
(compile + execute + collectives) but the efficiency NUMBER is meaningless
there (virtual devices share the same cores); it becomes real on a pod slice.

Usage:
    python tools/scaling_bench.py [--devices 1 2 4 8] [--platform cpu]
                                  [--pixels 98304] [--epochs 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    ap.add_argument("--pixels", type=int, default=98304)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument(
        "--mode", default="gngf", choices=["gngf", "scaled"],
        help="scaled: T=2^14/L=16 model with slot-axis TP over the mesh's "
             "model axis (tables sharded) — the config where DP weak "
             "scaling should hold the BASELINE >=80% target",
    )
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices))

    import numpy as np

    from collision_handling_in_instantngp_tpu.config import experiment_from_grid_id
    from collision_handling_in_instantngp_tpu.models import gngf
    from collision_handling_in_instantngp_tpu.parallel.mesh import (
        make_mesh,
        shard_state_and_batches,
    )
    from collision_handling_in_instantngp_tpu.train.train_step import (
        build_epoch_batches,
        make_epoch_fn,
    )

    exp = experiment_from_grid_id(4061)
    if args.mode == "scaled":
        import dataclasses

        from collision_handling_in_instantngp_tpu.config import (
            instantngp_scaled_model,
        )

        exp = dataclasses.replace(exp, model=instantngp_scaled_model())
    statics = gngf.make_statics(exp.model)
    rng = np.random.default_rng(0)
    p = args.pixels
    coords = rng.random((p, 2), dtype=np.float32)
    targets = rng.random((p, 3), dtype=np.float32)
    perm = rng.permutation(p).astype(np.int32)
    batches = build_epoch_batches(coords, targets, 1 / 3, perm, model_cfg=exp.model, statics=statics)

    init_state, make_jitted = make_epoch_fn(exp, statics)
    base_state, tx = init_state(jax.random.PRNGKey(65535))
    epoch = make_jitted(tx, p)

    results = []
    base_rate = None
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"# skipping {n} devices (only {len(jax.devices())})")
            continue
        mp = 2 if (args.mode == "scaled" and n % 2 == 0) else 1
        mesh = make_mesh(jax.devices()[:n], model_parallel=mp)
        state, b = shard_state_and_batches(
            base_state, batches, mesh, shard_tables=(mp > 1)
        )
        state, metrics, _ = epoch(state, b)           # compile + warmup
        float(metrics.loss)
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            state, metrics, _ = epoch(state, b)
        float(metrics.loss)
        dt = time.perf_counter() - t0
        rate = args.epochs * p / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        results.append({"devices": n, "pixels_per_s": round(rate, 1),
                        "efficiency_vs_linear": round(eff, 4)})
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
