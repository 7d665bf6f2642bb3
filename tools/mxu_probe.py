"""MXU / HBM efficiency probe at the scaled-config hot shapes.

Measures the IN-KERNEL dot ceiling without output-write contamination: a
Pallas kernel that computes the (U, H) x (H, T) dot tile-by-tile and emits
only per-row sums (no (U, T) HBM write), under several operand regimes:

  fp32 highest        - what the fused kernels run today
  fp32 default        - Mosaic's fp32 dot with DEFAULT precision
  bf16 operands       - 1-pass MXU rate (accumulate fp32)
  bf16x3 hi/lo        - manual 3-dot decomposition ~ XLA's HIGH (2^-22 rel err)

Plus an HBM streaming probe (pure write, read+write) to calibrate achievable
bandwidth, and the repo's fused kernels for comparison. All timings are
independently jitted programs fetching a scalar probe (ablate_scaled
methodology). The earlier version timed jnp.sum(jnp.matmul(...)) — XLA's
algebraic simplifier rewrites that to a vector product, so those numbers were
fiction; pallas interiors are opaque to the simplifier.

Writes a calibration artifact (--json-out, default
evidence/roofline_calibration.json) keyed by jax device_kind that
tools/roofline.py loads for its measured-ceiling model — recalibration after
a kernel or shape change is a re-run of this probe, not a code edit.

Usage: python tools/mxu_probe.py [--reps N] [--json-out PATH]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

U, H, T, L, K = 162304, 128, 16384, 16, 4


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--json-out",
        default=os.path.join(repo, "evidence", "roofline_calibration.json"),
        help="calibration artifact consumed by tools/roofline.py "
             "(pass '' to skip writing)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from collision_handling_in_instantngp_tpu.ops.pallas import (
        hpd_stream as hs,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    h = jax.random.normal(ks[0], (U, H), jnp.float32) * 0.3
    w = jax.random.normal(ks[1], (H, T), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (T,), jnp.float32) * 0.1
    counts = jax.random.uniform(ks[3], (L, U), jnp.float32)

    flops = 2 * U * H * T

    results = {}

    def timeit(name, fn, *fargs, key=None, nflops=None):
        probe = jax.jit(lambda *a: jnp.sum(fn(*a)).astype(jnp.float32))
        jax.device_get(probe(*fargs))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = probe(*fargs)
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / args.reps
        nf = nflops if nflops is not None else flops
        print(f"{name:40s} {dt * 1e3:9.2f} ms  {nf / dt / 1e12:7.2f} TF/s")
        if key:
            results[key] = round(nf / dt, 1)
        return dt

    BR, LT = 512, hs.LANE_TILE
    u_pad = -(-U // BR) * BR
    h_pad = jnp.pad(h, ((0, u_pad - U), (0, 0)))

    def rowsum_kernel(h_ref, w_ref, o_ref, *, precision, cast):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        hh, ww = h_ref[:], w_ref[:]
        if cast == "bf16":
            d = jnp.dot(
                hh.astype(jnp.bfloat16), ww.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32, precision="default",
            )
        elif cast == "bf16x3":
            h_hi = hh.astype(jnp.bfloat16)
            h_lo = (hh - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            w_hi = ww.astype(jnp.bfloat16)
            w_lo = (ww - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            mm = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32,
                precision="default",
            )
            d = mm(h_hi, w_hi) + mm(h_hi, w_lo) + mm(h_lo, w_hi)
        else:
            d = jnp.dot(
                hh, ww, preferred_element_type=jnp.float32,
                precision=precision,
            )
        o_ref[:] = o_ref[:] + jnp.sum(d, axis=-1, keepdims=True)

    def rowsum(hh, ww, precision="highest", cast="none"):
        return pl.pallas_call(
            functools.partial(
                rowsum_kernel, precision=precision, cast=cast
            ),
            grid=(u_pad // BR, T // LT),
            in_specs=[
                pl.BlockSpec((BR, H), lambda i, j: (i, 0)),
                pl.BlockSpec((H, LT), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((BR, 1), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((u_pad, 1), jnp.float32),
        )(hh, ww)

    print(f"dot shape ({U}, {H}) x ({H}, {T}) = {flops/1e9:.0f} GFLOP"
          f" (rowsum kernels: no (U, T) write)")
    timeit("pallas dot+rowsum fp32 [highest]", rowsum, h_pad, w,
           key="highest")
    timeit(
        "pallas dot+rowsum fp32 [default]",
        functools.partial(rowsum, precision="default"), h_pad, w,
    )
    timeit(
        "pallas dot+rowsum bf16 operands",
        functools.partial(rowsum, cast="bf16"), h_pad, w, key="default",
    )
    timeit(
        "pallas dot+rowsum bf16x3 hi/lo",
        functools.partial(rowsum, cast="bf16x3"), h_pad, w, key="high",
    )

    # HBM streaming: pure write of a (U, T/4) fp32 block (2.66 GB)
    wt = T // 4
    wbytes = u_pad * wt * 4

    def write_kernel(o_ref):
        o_ref[:] = jnp.ones_like(o_ref)

    def writer():
        return pl.pallas_call(
            write_kernel,
            grid=(u_pad // BR,),
            out_specs=pl.BlockSpec((BR, wt), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((u_pad, wt), jnp.float32),
        )()

    probe = jax.jit(lambda: jnp.sum(writer()[::4097, ::1023]))
    jax.device_get(probe())
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = probe()
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / args.reps
    print(
        f"{'pallas pure HBM write (2.66 GB)':40s} {dt * 1e3:9.2f} ms  "
        f"{wbytes / dt / 1e9:7.1f} GB/s"
    )
    results["hbm_stream"] = round(wbytes / dt, 1)

    big = jnp.ones((u_pad, wt), jnp.float32)

    def copy_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0

    def copier(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(u_pad // BR,),
            in_specs=[pl.BlockSpec((BR, wt), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BR, wt), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((u_pad, wt), jnp.float32),
            # in+out blocks double-buffered exceed the 16M default scope
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024
            ),
        )(x)

    probe = jax.jit(lambda x: jnp.sum(copier(x)[::4097, ::1023]))
    jax.device_get(probe(big))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = probe(big)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / args.reps
    print(
        f"{'pallas HBM read+write (2x2.66 GB)':40s} {dt * 1e3:9.2f} ms  "
        f"{2 * wbytes / dt / 1e9:7.1f} GB/s"
    )
    results["hbm_rw"] = round(2 * wbytes / dt, 1)

    # repo kernels at the same shapes, rated at their OWN matmul FLOP
    # counts (fwd: logits dot + cnt@p marginal = 2UT(H+L); bwd: logits
    # recompute + p@gm^T + cnt^T@gm + dl@w^T + h^T@dl = 2UT(3H+2L)) — the
    # r3 probe divided by ONE dot's flops and made the bwd look 4x off the
    # MXU floor when it actually runs at ~3.25 dots of work
    timeit(
        "fused fwd kernel [highest]",
        lambda *a: hs.hpd_stream_fused_fwd(*a, K, "highest")[0],
        h, w, b, counts,
        nflops=2 * U * T * (H + L), key="fused_fwd_highest",
    )
    vals, idx, m, s = jax.jit(
        lambda *a: hs.hpd_stream_select(*a, K, "highest")
    )(h, w, b)
    gmarg = jax.random.normal(ks[0], (L, T), jnp.float32)
    gvals = jax.random.normal(ks[1], (U, K), jnp.float32)
    timeit(
        "fused bwd kernel [highest]",
        lambda *a: hs.hpd_stream_fused_bwd(*a, K, "highest")[0],
        h, w, b, counts, idx, vals, m, s, gmarg, gvals,
        nflops=2 * U * T * (3 * H + 2 * L), key="fused_bwd_highest",
    )

    if args.json_out:
        kind = jax.devices()[0].device_kind
        path = args.json_out
        cal = {}
        if os.path.exists(path):
            with open(path) as fh:
                cal = json.load(fh)
        cal[kind] = {
            **results,
            "probe_shape": [U, H, T],
            "reps": args.reps,
            "stamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(cal, fh, indent=1, sort_keys=True)
        print(f"calibration -> {path} [{kind}]")


if __name__ == "__main__":
    main()
