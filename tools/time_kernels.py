"""Per-kernel timing for the scaled-config hot path (BASELINE config 4,
T=2^14, L=16): times each streaming-tail Pallas kernel and the blend /
hidden-stack jnp stages in isolation at the real shapes, so optimization
targets the measured chunk rather than the guessed one.

Shapes mirror one training batch of the scaled config on strawberry.jpeg
(U = (512+2)^2 unique dedup vertices, reference batch 1/3 of the image).

Usage: python tools/time_kernels.py [--reps N] [--precision highest|high|default]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from collision_handling_in_instantngp_tpu.models import encoding as enc
    from collision_handling_in_instantngp_tpu.ops.pallas import (
        hpd_stream as hs,
    )

    U, H, T, L, K = 264196, 128, 16384, 16, 4
    prec = args.precision
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    h = jax.random.normal(ks[0], (U, H), jnp.float32) * 0.3
    w = jax.random.normal(ks[1], (H, T), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (T,), jnp.float32) * 0.1
    counts = jax.random.uniform(ks[3], (L, U), jnp.float32)
    tables = jax.random.normal(ks[4], (L, T, 2), jnp.float32) * 1e-4
    gmarg = jax.random.normal(ks[5], (L, T), jnp.float32)
    gvals = jax.random.normal(ks[6], (U, K), jnp.float32)
    gfeat = jax.random.normal(ks[7], (L, U, 2), jnp.float32)

    def bench(name, fn, *fargs, reps=args.reps):
        out = fn(*fargs)
        # axon tunnel: force a device->host transfer to drain (see
        # utils/profiling.py StepTimer note)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*fargs)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        print(f"{name:28s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
        return out

    sel = jax.jit(lambda h, w, b: hs.hpd_stream_select(h, w, b, K, prec))
    vals, idx, m, s = bench("select kernel", sel, h, w, b)
    marg = jax.jit(lambda *a: hs.hpd_stream_marginal(*a, prec))
    bench("marginal kernel", marg, h, w, b, counts, m, s)
    bwd = jax.jit(
        lambda *a: hs.hpd_tail_unique_pallas_bwd(*a, K, prec)
    )
    bench("bwd kernels (B1+B2)", bwd, h, w, b, counts, idx, vals, m, s,
          gmarg, gvals)

    fwd_f = jax.jit(lambda *a: hs.hpd_stream_fused_fwd(*a, K, prec))
    bench("fused fwd kernel", fwd_f, h, w, b, counts)
    bwd_f = jax.jit(lambda *a: hs.hpd_stream_fused_bwd(*a, K, prec))
    bench("fused bwd kernel", bwd_f, h, w, b, counts, idx, vals, m, s,
          gmarg, gvals)

    # active-vertex compaction shrinks U to the touched rows (~61% at 1/3
    # batches); re-time the fused pair at that row count
    u_c = 162304
    fwd_c = jax.jit(lambda *a: hs.hpd_stream_fused_fwd(*a, K, prec))
    bench("fused fwd @ compacted U", fwd_c, h[:u_c], w, b, counts[:, :u_c])
    bwd_c = jax.jit(lambda *a: hs.hpd_stream_fused_bwd(*a, K, prec))
    bench("fused bwd @ compacted U", bwd_c, h[:u_c], w, b, counts[:, :u_c],
          idx[:u_c], vals[:u_c], m[:u_c], s[:u_c], gmarg, gvals[:u_c])

    blend_f = jax.jit(lambda t_, i_, w_: enc._blend_core(t_, i_, w_))
    bench("blend fwd (S-matrix)", blend_f, tables, idx, vals)
    blend_vjp = jax.jit(
        lambda t_, i_, w_, g_: jax.vjp(
            lambda tt, ww: enc._blend_core(tt, i_, ww), t_, w_
        )[1](g_)
    )
    bench("blend bwd", blend_vjp, tables, idx, vals, gfeat)

    # hidden stack fwd (3 small matmuls on U rows)
    hw1 = jax.random.normal(ks[0], (2, 32))
    hb1 = jnp.zeros((32,))
    hw2 = jax.random.normal(ks[1], (32, 64))
    hb2 = jnp.zeros((64,))
    hw3 = jax.random.normal(ks[2], (64, 128))
    hb3 = jnp.zeros((128,))
    coords = jax.random.uniform(ks[3], (U, 2)) * 513
    hidden = jax.jit(
        lambda c: jax.nn.relu(
            jax.nn.relu(jax.nn.relu(c @ hw1 + hb1) @ hw2 + hb2) @ hw3 + hb3
        )
    )
    bench("hidden stack fwd", hidden, coords)


if __name__ == "__main__":
    main()
