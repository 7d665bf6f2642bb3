"""Gather/scatter formulation probe for the K-blend at scaled shapes.

The S-matrix blend trades a tiny gather (U*K rows of a (T, L*F) table,
~83 MB) for 85 GMAC one-hot contractions per direction plus (R, T) HBM
temps. This probe times the native-gather alternatives XLA offers on TPU:

  take rows            tables2 (T, L*F=32), idx (U*K,) -> (U*K, 32)
  take + blend         same + einsum to (L, U, F)
  segment scatter-add  dt: (U*K, 32) rows into (T, 32) [jax.ops.segment_sum]
  blend fwd today      _blend_core S-matrix form (reference point)
  blend bwd today      its VJP (reference point)

Usage: python tools/gather_probe.py [--reps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

U, H, T, L, K, F = 162304, 128, 16384, 16, 4, 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json-out", default="",
                    help="write {label: ms} to this path")
    args = ap.parse_args()
    recorded = {}

    import jax
    import jax.numpy as jnp

    from collision_handling_in_instantngp_tpu.models import encoding as enc

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    tables = jax.random.normal(ks[0], (L, T, F), jnp.float32) * 1e-4
    idx = jax.random.randint(ks[1], (U, K), 0, T)
    w = jax.random.uniform(ks[2], (U, K), jnp.float32)
    g = jax.random.normal(ks[3], (L, U, F), jnp.float32)

    def timeit(name, fn, *fargs):
        probe = jax.jit(
            lambda *a: sum(
                jnp.sum(x).astype(jnp.float32)
                for x in jax.tree_util.tree_leaves(fn(*a))
            )
        )
        jax.device_get(probe(*fargs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = probe(*fargs)
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:44s} {dt * 1e3:9.2f} ms")
        recorded[name] = round(dt * 1e3, 2)
        return dt

    tables2 = tables.transpose(1, 0, 2).reshape(T, L * F)      # (T, 32)

    def take_rows(t2, i):
        return jnp.take(t2, i.reshape(-1), axis=0)             # (U*K, 32)

    timeit("take rows (U*K, 32)", take_rows, tables2, idx)

    def take_blend(t2, i, ww):
        rows = jnp.take(t2, i.reshape(-1), axis=0)             # (U*K, 32)
        rows = rows.reshape(U, K, L, F)
        return jnp.einsum("uklf,uk->luf", rows, ww, precision="highest")

    timeit("take + blend -> (L, U, F)", take_blend, tables2, idx, w)

    def seg_scatter(i, ww, gg):
        # dt[t, lf] = sum_{u,k: idx=t} w[u,k] * g[:, u, :]
        rows = jnp.einsum("luf,uk->uklf", gg, ww, precision="highest")
        rows = rows.reshape(U * K, L * F)
        return jax.ops.segment_sum(
            rows, i.reshape(-1), num_segments=T
        )

    timeit("scatter-add rows -> (T, 32) [segment_sum]", seg_scatter, idx, w, g)

    def seg_scatter_sorted(i, ww, gg):
        order = jnp.argsort(i.reshape(-1))
        rows = jnp.einsum("luf,uk->uklf", gg, ww, precision="highest")
        rows = rows.reshape(U * K, L * F)[order]
        return jax.ops.segment_sum(
            rows, i.reshape(-1)[order], num_segments=T,
            indices_are_sorted=True,
        )

    timeit(
        "argsort + sorted scatter-add -> (T, 32)",
        seg_scatter_sorted, idx, w, g,
    )

    def seg_scatter_vmem(i, ww, gg):
        from collision_handling_in_instantngp_tpu.ops.pallas.scatter_probe import (
            scatter_add_vmem,
        )

        rows = (
            ww[:, :, None] * gg.transpose(1, 0, 2).reshape(U, 1, L * F)
        ).reshape(U * K, L * F)
        return scatter_add_vmem(rows, i.reshape(-1), T)

    timeit(
        "VMEM serial scatter-add -> (T, 32) [pallas probe]",
        seg_scatter_vmem, idx, w, g,
    )

    # today's forms
    timeit("blend fwd today (S-matrix)", enc._blend_core, tables, idx, w)

    def blend_bwd(t_, i_, w_, g_):
        return jax.vjp(lambda tt, ww: enc._blend_core(tt, i_, ww), t_, w_)[1](
            g_
        )

    timeit("blend bwd today (S-matrix VJP)", blend_bwd, tables, idx, w, g)

    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump({
                "shape": {"U": U, "T": T, "L": L, "K": K, "F": F},
                "device_kind": jax.devices()[0].device_kind,
                "reps": args.reps,
                "ms": recorded,
            }, f, indent=1)


if __name__ == "__main__":
    main()
