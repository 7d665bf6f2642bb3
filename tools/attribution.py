"""Per-stage attribution of the scaled-config training batch that SUMS to
the measured step (VERDICT r3 #5: "a table whose rows sum to the epoch").

Methodology — cumulative prefixes: stage k's program runs the REAL pipeline
from the batch inputs up through stage k and reduces the live intermediates
to one scalar probe; timings telescope, so

    stage_cost(k) = t(prefix_k) - t(prefix_{k-1})

and the rows sum to the full-step time BY CONSTRUCTION (the last prefix IS
the full step). Backward column: jax.grad of the prefix scalar w.r.t.
params (the final row's program is the true loss+grad+optimizer step, so
the backward column's total is the real measured step too). Caveat: an
intermediate prefix's backward sees a ones-cotangent at its probe rather
than the real upstream cotangent — same FLOPs, same memory traffic, but
XLA may schedule slightly differently; the telescoped diffs attribute cost,
not bit-exact subsets.

Stages (the gngf.forward dedup/compacted path, mirrored exactly — any
drift would misattribute, so the final prefix's fwd time is cross-checked
against the monolithic loss program):

  geometry   scale_to_grid + bilinear coeffs + active-vertex coords
  hidden     HPD hidden stack on unique vertices (pallas fused or remat jax)
  tail       streaming fused tail: logits + online-softmax top-k + marginal
  blend      K-blend of table rows + per-pixel gather + interpolate
  decoder    pixel MLP -> rgb
  loss       MSE + JS/KL + collision terms
  optimizer  3-group Adam update + apply  (backward column only)

Usage: python tools/attribution.py [--mode scaled|gngf] [--precision P]
                                   [--reps N] [--json-out PATH]
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scaled", choices=["scaled", "gngf"])
    ap.add_argument("--precision", default=None,
                    choices=["default", "high", "highest"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json-out", default="")
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
    from collision_handling_in_instantngp_tpu.models import encoding as enc
    from collision_handling_in_instantngp_tpu.models import gngf
    from collision_handling_in_instantngp_tpu.models.hpd import apply_hpd_unique
    from collision_handling_in_instantngp_tpu.models.mlp import apply_mlp
    from collision_handling_in_instantngp_tpu.ops import dedup as dedup_ops
    from collision_handling_in_instantngp_tpu.ops.grid import scale_to_grid
    from collision_handling_in_instantngp_tpu.ops.interpolate import (
        bilinear_coeffs,
        interpolate,
    )
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
            train=dataclasses.replace(exp.train, batch_fraction=1 / 3),
        )
    if args.precision:
        exp = dataclasses.replace(
            exp,
            model=dataclasses.replace(
                exp.model, matmul_precision=args.precision
            ),
        )
    mcfg, lcfg = exp.model, exp.loss
    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))
    statics = gngf.make_statics(mcfg)
    shuffled, _ = make_shuffle_permutations(data.num_pixels, exp.train.seed, True)
    batches = build_epoch_batches(
        data.coords, data.targets, exp.train.batch_fraction, shuffled,
        og_image=data.image, model_cfg=mcfg, statics=statics,
    )
    bx, by, nvalid = batches.x[0], batches.y[0], batches.valid[0]
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
    assert dedup is not None, (
        "attribution targets the dedup path; this config fell back"
    )
    compacted = dedup.active is not None

    key = jax.random.PRNGKey(exp.train.seed)
    params = gngf.init_params(key, mcfg)
    tx = make_optimizer(exp.optimizer, params)
    opt_state = tx.init(params)
    prev_coll = jnp.zeros((mcfg.num_levels,), jnp.float32)
    prev_min = jnp.ones((mcfg.num_levels,), jnp.float32)

    n_ls = jnp.asarray(statics.n_ls)
    offsets = jnp.asarray(statics.offsets)
    side = dedup_ops.grid_side(mcfg.n_max)
    cell_info = None
    if mcfg.input_dim == 2 and mcfg.num_corners == 4:
        cell_info = (tuple(int(n) for n in statics.n_ls), side)

    def probe(*trees):
        leaves = [
            l for t in trees for l in jax.tree_util.tree_leaves(t)
            if hasattr(l, "dtype")
        ]
        return functools.reduce(
            jnp.add, [jnp.sum(l).astype(jnp.float32) for l in leaves]
        )

    # ---- cumulative prefixes (mirror gngf.forward's use_dedup branch) ----
    def prefix(params, upto):
        if upto == "noop":
            # dispatch/transfer/probe baseline: everything a prefix pays
            # before any model math, so the geometry row stops absorbing it
            return probe(bx) + probe(params)
        scaled, corners = scale_to_grid(bx, n_ls, offsets)
        scaled = jax.lax.stop_gradient(scaled)
        ucoords = (
            dedup_ops.active_coords(dedup.active, side)
            if compacted
            else jnp.asarray(statics.unique_coords)
        )
        coeffs = bilinear_coeffs(scaled, offsets)
        if upto == "geometry":
            return probe(ucoords, coeffs)
        ids, counts = dedup.ids, dedup.counts
        if upto == "hidden":
            # exactly the hidden-stack call apply_hpd_unique makes; calling
            # the full apply would also run the tail
            from collision_handling_in_instantngp_tpu.ops.pallas import (
                hidden as _hidden,
            )

            hw = tuple(lay["w"].shape[0] for lay in params["hpd"][:-1])
            if _hidden.supports(hw + (params["hpd"][-2]["w"].shape[1],)):
                h = _hidden.hidden_stack_pallas(
                    ucoords,
                    tuple((lay["w"], lay["b"]) for lay in params["hpd"][:-1]),
                    mcfg.matmul_precision,
                    jax.devices()[0].platform == "cpu",
                )
            else:
                h = ucoords
                for layer in params["hpd"][:-1]:
                    h = jax.nn.relu(
                        jnp.matmul(
                            h, layer["w"], precision=mcfg.matmul_precision
                        ) + layer["b"]
                    )
            return probe(h, coeffs)
        marginal_raw, vals_u, idx_u = apply_hpd_unique(
            params["hpd"], ucoords, mcfg, counts=counts
        )
        if upto == "tail":
            return probe(marginal_raw, vals_u, idx_u, coeffs)
        feats_u = enc.blend_unique(params["tables"], idx_u, vals_u, mcfg)
        feats = enc.gather_rows(
            feats_u, ids, cell_info=cell_info, active=dedup.active,
            base=dedup.base,
            cell_corners=dedup.cell_corners if mcfg.dedup_cell_gather else None,
            pixel_cell=dedup.pixel_cell,
        )
        h_pix = interpolate(feats, coeffs)
        if upto == "blend":
            return probe(h_pix, marginal_raw)
        rgb = apply_mlp(
            params["mlp"], h_pix,
            hidden_activation=mcfg.hidden_activation.value,
            final_activation="sigmoid", precision=mcfg.matmul_precision,
        )
        if upto == "decoder":
            return probe(rgb, marginal_raw)
        rows = bx.shape[0] * mcfg.num_corners
        marginal = marginal_raw / rows
        aux = compute_loss(
            rgb, by, None, prev_coll, prev_min, lcfg, mcfg.num_levels,
            marginals=marginal, valid_rows=nvalid,
        )
        return aux.total

    STAGES = ["noop", "geometry", "hidden", "tail", "blend", "decoder",
              "loss"]

    # fidelity check: the mirrored pipeline must compute the REAL model's
    # loss, or the stage attribution is attributing a different program
    def real_loss(params):
        out = gngf.forward(
            params, bx, mcfg, statics, train=True, dedup=dedup,
            need_indices=False,
        )
        aux = compute_loss(
            out.rgb, by, out.probs, prev_coll, prev_min, lcfg,
            mcfg.num_levels, marginals=out.marginal, valid_rows=nvalid,
        )
        return aux.total

    lp = float(jax.jit(functools.partial(prefix, upto="loss"))(params))
    lr = float(jax.jit(real_loss)(params))
    assert abs(lp - lr) <= 1e-5 * max(1.0, abs(lr)), (
        f"prefix pipeline diverged from gngf.forward: {lp} vs {lr}"
    )

    def timeit(fn, *fargs):
        jax.device_get(fn(*fargs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*fargs)
        jax.device_get(out)
        return (time.perf_counter() - t0) / args.reps

    fwd_t, bwd_t = {}, {}
    for s in STAGES:
        f = jax.jit(functools.partial(prefix, upto=s))
        fwd_t[s] = timeit(f, params)
        # value_and_grad, NOT prefix(p)+probe(grad(prefix)(p)): the latter
        # runs the forward TWICE (the plain forward and grad's vjp-forward
        # carry different custom_vjp residual programs, so XLA cannot CSE
        # them) and inflated every backward row by ~one forward (~61 ms at
        # the scaled geometry), surfacing as a nonsense -60 ms optimizer row.
        g = jax.jit(
            lambda p, _s=s: (lambda vg: vg[0] + probe(vg[1]))(
                jax.value_and_grad(lambda q: prefix(q, _s))(p)
            )
        )
        bwd_t[s] = timeit(g, params)

    # full real step (loss grad + optimizer) for the optimizer row and the
    # cross-check against the monolithic program
    @jax.jit
    def full_step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: prefix(p, "loss"))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return loss + probe(optax.apply_updates(params, updates), opt_state)

    t_step = timeit(full_step, params, opt_state)

    p = bx.shape[0]
    print(f"mode={args.mode} precision={mcfg.matmul_precision} "
          f"batch_rows={p} device={jax.devices()[0].device_kind} "
          f"reps={args.reps}")
    print(f"{'stage':10s} {'fwd ms':>9s} {'Δfwd':>8s} {'fwd+bwd ms':>11s} "
          f"{'Δ(f+b)':>8s}")
    prev_f = prev_b = 0.0
    rows = []
    for s in STAGES:
        df, db = fwd_t[s] - prev_f, bwd_t[s] - prev_b
        print(f"{s:10s} {fwd_t[s]*1e3:9.2f} {df*1e3:8.2f} "
              f"{bwd_t[s]*1e3:11.2f} {db*1e3:8.2f}")
        rows.append({"stage": s, "fwd_ms": round(fwd_t[s] * 1e3, 2),
                     "d_fwd_ms": round(df * 1e3, 2),
                     "fwdbwd_ms": round(bwd_t[s] * 1e3, 2),
                     "d_fwdbwd_ms": round(db * 1e3, 2)})
        prev_f, prev_b = fwd_t[s], bwd_t[s]
    d_opt = t_step - bwd_t["loss"]
    print(f"{'optimizer':10s} {'':>9s} {'':>8s} {t_step*1e3:11.2f} "
          f"{d_opt*1e3:8.2f}")
    rows.append({"stage": "optimizer", "fwdbwd_ms": round(t_step * 1e3, 2),
                 "d_fwdbwd_ms": round(d_opt * 1e3, 2)})
    print(f"TOTAL step {t_step*1e3:.2f} ms/batch "
          f"({p / t_step / 1e3:.1f}K px/s at {batches.x.shape[0]} batches)")

    u_rows = int(
        dedup_ops.active_coords(dedup.active, side).shape[0]
        if compacted else statics.unique_coords.shape[0]
    )
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump({
                "mode": args.mode, "precision": mcfg.matmul_precision,
                "batch_rows": int(p), "reps": args.reps,
                "unique_rows": u_rows,
                "dims": {"H": int(mcfg.hpd_hidden[-1]),
                         "T": int(mcfg.hash_table_size),
                         "L": int(mcfg.num_levels),
                         "K": int(mcfg.topk_k),
                         "F": int(mcfg.feature_dim),
                         "hpd_hidden": list(mcfg.hpd_hidden),
                         "mlp_hidden": list(mcfg.mlp_hidden),
                         "input_dim": int(mcfg.input_dim),
                         "corners": int(mcfg.num_corners)},
                "device_kind": jax.devices()[0].device_kind,
                "rows": rows, "step_ms": round(t_step * 1e3, 2),
                "stamp": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            }, fh, indent=1)
        print(f"-> {args.json_out}")


if __name__ == "__main__":
    main()
