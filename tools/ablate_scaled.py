"""Per-stage time split for one training batch on the current device.

Times each stage as its OWN jitted program whose return value is a single
scalar probe depending on the whole computation:
  fwd      loss value only
  grad     jax.value_and_grad of the loss
  update   optimizer update + apply (grads precomputed, NOT in the program)
  step     grad + optimizer update (one scan-body equivalent)

Timing fetches ONLY the scalar probe: an XLA executable finishes as a unit,
so materializing one output bounds execution; fetching the full output pytree
(the old behavior) billed hundreds of per-leaf device->host round-trips over
the axon tunnel to whichever stage returned the most leaves — `step`'s
params+opt_state made the optimizer look ~1.8 s/batch when the real epoch was
291 ms/batch (runs/hw_session_20260818_224639.log:16-24, negative "bwd").

Usage: python tools/ablate_scaled.py [--mode scaled|gngf] [--batch-fraction F]
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, reps=5):
    """fn must return a SCALAR (or tiny array) probe. Warm up once, queue
    reps calls (device executions serialize), then drain the LAST probe —
    total elapsed = reps x execution + one tunnel round-trip, so small stages
    aren't inflated by per-rep transfer latency."""
    import jax

    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scaled", choices=["scaled", "gngf"])
    ap.add_argument("--batch-fraction", type=float, default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--cell-gather", action="store_true",
        help="A/B the cell-table per-pixel gather "
             "(ModelConfig.dedup_cell_gather)",
    )
    ap.add_argument(
        "--precision", default=None,
        choices=["default", "high", "highest"],
        help="Override matmul precision for the whole stage programs "
             "(same semantics as bench.py --precision)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from collision_handling_in_instantngp_tpu.config import (
        experiment_from_grid_id,
        instantngp_scaled_model,
    )
    from collision_handling_in_instantngp_tpu.data import (
        load_image_dataset,
        make_shuffle_permutations,
    )
    from collision_handling_in_instantngp_tpu.models import gngf
    from collision_handling_in_instantngp_tpu.ops import dedup as dedup_ops
    from collision_handling_in_instantngp_tpu.train.loss import compute_loss
    from collision_handling_in_instantngp_tpu.train.optimizer import (
        make_optimizer,
    )
    from collision_handling_in_instantngp_tpu.train.train_step import (
        build_epoch_batches,
    )

    exp = experiment_from_grid_id(4061)
    if args.mode == "scaled":
        exp = dataclasses.replace(
            exp,
            model=instantngp_scaled_model(),
            train=dataclasses.replace(exp.train, batch_fraction=1 / 8),
        )
    if args.batch_fraction:
        exp = dataclasses.replace(
            exp,
            train=dataclasses.replace(
                exp.train, batch_fraction=args.batch_fraction
            ),
        )
    if args.cell_gather:
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, dedup_cell_gather=True)
        )
    if args.precision:
        exp = dataclasses.replace(
            exp,
            model=dataclasses.replace(
                exp.model, matmul_precision=args.precision
            ),
        )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))
    statics = gngf.make_statics(exp.model)
    shuffled, _ = make_shuffle_permutations(
        data.num_pixels, exp.train.seed, True
    )
    batches = build_epoch_batches(
        data.coords, data.targets, exp.train.batch_fraction, shuffled,
        og_image=data.image, model_cfg=exp.model, statics=statics,
    )
    mcfg, lcfg = exp.model, exp.loss

    key = jax.random.PRNGKey(exp.train.seed)
    params = gngf.init_params(key, mcfg)
    tx = make_optimizer(exp.optimizer, params)
    opt_state = tx.init(params)
    prev_coll = jnp.zeros((mcfg.num_levels,), jnp.float32)
    prev_min = jnp.ones((mcfg.num_levels,), jnp.float32)

    bx = batches.x[0]
    by = batches.y[0]
    nvalid = batches.valid[0]
    dedup = None
    if batches.dedup_ids is not None:
        dedup = dedup_ops.DedupGeometry(
            batches.dedup_ids[0], batches.dedup_counts[0],
            batches.dedup_rev[0] if batches.dedup_rev is not None else None,
            batches.dedup_active[0] if batches.dedup_active is not None else None,
            batches.dedup_base[0] if batches.dedup_base is not None else None,
            tuple(c[0] for c in batches.dedup_cell_corners)
            if batches.dedup_cell_corners is not None else None,
            batches.dedup_pixel_cell[0]
            if batches.dedup_pixel_cell is not None else None,
        )

    def loss_fn(params, bx, by):
        out = gngf.forward(
            params, bx, mcfg, statics, train=True, dedup=dedup,
            need_indices=False,
        )
        aux = compute_loss(
            out.rgb, by, out.probs, prev_coll, prev_min, lcfg,
            mcfg.num_levels, marginals=out.marginal, valid_rows=nvalid,
        )
        return aux.total

    def _probe(tree):
        # scalar that depends on every leaf — forces full execution while
        # keeping the fetched output a single float
        leaves = jax.tree_util.tree_leaves(tree)
        return functools.reduce(
            jnp.add, [jnp.sum(l).astype(jnp.float32) for l in leaves]
        )

    fwd = jax.jit(loss_fn)

    @jax.jit
    def grad(params, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        return loss + _probe(grads)

    @jax.jit
    def update(grads, opt_state, params):
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return _probe((new_params, opt_state))

    @jax.jit
    def step(params, opt_state, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss + _probe((optax.apply_updates(params, updates), opt_state))

    grads_const = jax.jit(
        lambda params, bx, by: jax.grad(loss_fn)(params, bx, by)
    )(params, bx, by)
    jax.block_until_ready(grads_const)

    p = bx.shape[0]
    t_fwd = _timeit(fwd, params, bx, by, reps=args.reps)
    t_grad = _timeit(grad, params, bx, by, reps=args.reps)
    t_update = _timeit(update, grads_const, opt_state, params, reps=args.reps)
    t_step = _timeit(step, params, opt_state, bx, by, reps=args.reps)
    print(
        f"mode={args.mode} batch_rows={p} device={jax.devices()[0].platform}"
    )
    print(f"fwd     {t_fwd * 1e3:9.2f} ms/batch   (loss only)")
    print(f"grad    {t_grad * 1e3:9.2f} ms/batch   (fwd+bwd)")
    print(f"update  {t_update * 1e3:9.2f} ms/batch   (optimizer only)")
    print(f"step    {t_step * 1e3:9.2f} ms/batch   (fwd+bwd+update)")
    print(
        f"derived: bwd ~ {max(t_grad - t_fwd, 0) * 1e3:.2f} ms, "
        f"fusion overlap (grad+update-step) ~ "
        f"{(t_grad + t_update - t_step) * 1e3:.2f} ms"
    )


if __name__ == "__main__":
    main()
