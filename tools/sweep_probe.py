"""Measure the streaming-tail phase costs IN PLACE (VERDICT r4 weak #6: the
attribution's "~23 ms VPU sweep" row was arithmetic, not a measurement).

Four rungs, same kernel structure, later phases removed (hpd_stream.py
probe-variant comment):

  dots     (R,H)@(H,TT) MXU per lane tile + 1-pass sum
  softmax  + online max / exp / sum-exp
  select   hpd_stream_fused_fwd(need_marginal=False): + K-pass top-k merge
           and the e-cache write
  full     + marginal accumulation (counts MXU per tile)

Deltas between rungs measure: exp/max cost, top-k-merge+cache cost, marginal
cost. Runs at the REAL scaled tail shape (U unique vertices from the
strawberry dedup geometry, H=128, T=2^14, K=4) at each precision.

Usage: python tools/sweep_probe.py [--json-out evidence/sweep_probe.json]
                                   [--reps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--json-out", default="")
    ap.add_argument("--u", type=int, default=161792)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--t", type=int, default=2 ** 14)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--l", type=int, default=16)
    ap.add_argument("--interpret", action="store_true",
                    help="pallas interpret mode (CPU smoke test only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from collision_handling_in_instantngp_tpu.ops.pallas import hpd_stream as hs

    rng = np.random.default_rng(65535)
    h = jnp.asarray(rng.normal(size=(args.u, args.hd)), jnp.float32)
    w = jnp.asarray(
        rng.normal(size=(args.hd, args.t), scale=0.1), jnp.float32
    )
    b = jnp.zeros((1, args.t), jnp.float32)
    counts = jnp.asarray(
        rng.integers(1, 5, size=(args.l, args.u)), jnp.float32
    )

    def timeit(fn):
        out = fn()
        jax.block_until_ready(jax.device_get(out))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        jax.block_until_ready(jax.device_get(out))
        return (time.perf_counter() - t0) / args.reps * 1e3

    results = {"shape": {"u": args.u, "hd": args.hd, "t": args.t,
                         "k": args.k, "l": args.l},
               "device_kind": jax.devices()[0].device_kind,
               "reps": args.reps}
    for prec in ("highest", "high", "default"):
        rung = {}
        ip = args.interpret
        rung["dots_ms"] = timeit(jax.jit(
            lambda h=h: hs.hpd_stream_fused_probe(
                h, w, b, prec, "dots", interpret=ip)
        ))
        rung["softmax_ms"] = timeit(jax.jit(
            lambda h=h: hs.hpd_stream_fused_probe(
                h, w, b, prec, "softmax", interpret=ip)
        ))
        rung["select_ms"] = timeit(jax.jit(
            lambda h=h: hs.hpd_stream_fused_fwd(
                h, w, b, counts, args.k, prec, need_marginal=False,
                interpret=ip,
            )
        ))
        rung["full_ms"] = timeit(jax.jit(
            lambda h=h: hs.hpd_stream_fused_fwd(
                h, w, b, counts, args.k, prec, need_marginal=True,
                interpret=ip,
            )
        ))
        rung["exp_max_cost_ms"] = round(
            rung["softmax_ms"] - rung["dots_ms"], 3
        )
        rung["topk_cache_cost_ms"] = round(
            rung["select_ms"] - rung["softmax_ms"], 3
        )
        rung["marginal_cost_ms"] = round(
            rung["full_ms"] - rung["select_ms"], 3
        )
        results[prec] = {k: round(v, 3) if isinstance(v, float) else v
                         for k, v in rung.items()}
        print(json.dumps({"precision": prec, **results[prec]}), flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
