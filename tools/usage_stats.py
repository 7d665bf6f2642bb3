"""Per-level slot-usage statistics from a saved checkpoint (VERDICT r4 #1c:
what does the JS/KL uniformity prior actually change?).

Loads a run's best-epoch ``whole_model.pkl``, runs the model forward over the
full image (same 1/3 batches as training), and reports per level:

  * usage entropy (bits) of the unique-cell top-1 slot histogram (the same
    counts the reference's ``_calc_counts_per_level`` tracks,
    reference models.py:530-566) vs the log2(T) uniform maximum,
  * slots used (of T) and the max-slot share,
  * entropy (bits) and KL-to-uniform (nats) of the HPD's *probability
    marginal* — the quantity the JS/KL loss actually regularizes
    (reference utils.py:138/159: p_output = prob.sum(pixels,vertices)/(P·4)).

Usage: python tools/usage_stats.py RUN_DIR [RUN_DIR ...] [--flagship]
       (RUN_DIR e.g. weights/4061_cold_seed65535_scaled_elr0.01)
Prints one JSON line per run dir; run on the TPU (the scaled HPD streaming
kernels have no fast CPU path).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.config import (
    experiment_from_grid_id,
    instantngp_scaled_model,
)
from collision_handling_in_instantngp_tpu.data import load_image_dataset
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.utils.checkpoint import load_pytree


def entropy_bits(p):
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def stats_for_run(run_dir, cfg, data, batch_fraction=1 / 3):
    statics = gngf.make_statics(cfg)
    params = load_pytree(os.path.join(run_dir, "whole_model.pkl"))
    P = data.num_pixels
    bs = int(np.ceil(P * batch_fraction))
    T = cfg.hash_table_size
    L = cfg.num_levels

    # train=True: the dedup path only builds the counts-weighted loss
    # marginal under training (counts=None in eval); batchnorm is off in
    # these configs so the flag changes nothing else
    fwd = jax.jit(
        lambda pr, xb: gngf.forward(
            pr, xb, cfg, statics, train=True, need_indices=True
        )
    )
    counts = np.zeros((L, T), dtype=np.float64)
    marginal = np.zeros((L, T), dtype=np.float64)
    rows = 0
    for s in range(0, P, bs):
        xb = jnp.asarray(data.coords[s:s + bs])
        out = fwd(params, xb)
        c = gngf.calc_counts_per_level(out.indices, out.corners, cfg, statics)
        counts += np.asarray(jax.device_get(c), dtype=np.float64)
        m = np.asarray(jax.device_get(out.marginal), dtype=np.float64)
        marginal += m * xb.shape[0]
        rows += xb.shape[0]
    marginal /= rows

    per_level = []
    for l in range(L):
        c = counts[l]
        tot = c.sum()
        p_usage = c / tot if tot else c
        m = marginal[l]
        m = m / m.sum()
        kl_uniform = float(
            (m[m > 0] * np.log(m[m > 0] * T)).sum()
        )  # KL(marginal || uniform), nats
        per_level.append({
            "level": l,
            "cells": int(tot),
            "slots_used": int((c > 0).sum()),
            "usage_entropy_bits": round(entropy_bits(p_usage), 4),
            "max_entropy_bits": round(float(np.log2(T)), 4),
            "max_slot_share": round(float(p_usage.max()), 6) if tot else None,
            "marginal_entropy_bits": round(entropy_bits(m), 4),
            "marginal_kl_uniform_nats": round(kl_uniform, 6),
        })
    return per_level


def main(run_dirs, flagship=False):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # exactly the configs the cold runs trained (tools/run_cold.py): flagship
    # = experiment_from_grid_id(4061).model; scaled = instantngp_scaled_model()
    # verbatim (run_cold replaces the model wholesale, keeping its defaults)
    exp = experiment_from_grid_id(4061)
    cfg = exp.model if flagship else instantngp_scaled_model()
    data = load_image_dataset(os.path.join(repo, "images", "strawberry.jpeg"))
    for rd in run_dirs:
        per_level = stats_for_run(rd, cfg, data)
        print(json.dumps({"run_dir": rd, "levels": per_level}), flush=True)


if __name__ == "__main__":
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(dirs, flagship="--flagship" in sys.argv[1:])
