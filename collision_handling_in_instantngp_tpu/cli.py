"""Command-line entry point.

Mirrors the reference CLI (main.py:11-21):

  python -m collision_handling_in_instantngp_tpu.cli \
      -f strawberry.jpeg -s 4061 -e 4061 [-t] [--should_bw] \
      [--wandb_entity ... --wandb_project ... --wandb_name ...] \
      [-hwp HPD.pkl] [-ewp encoding.pkl]

Reference-compatible semantics: ``-e`` is INCLUSIVE (main.py:33 adds 1), images
load from ``--images_dir`` (default ./images), coords are normalized by
``max(w,h)-1`` unless the model batch-normalizes its input. ``-ewp`` is
accepted-but-dead in the reference (models.py:288-289); here it actually loads
encoding tables (documented divergence — sane semantics).

Extras over the reference: ``--epochs`` override, ``--logger {jsonl,wandb,null}``,
``--shard-index/--shard-count`` for config-parallel sweeps, ``--manifest`` for
idempotent resume.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run General Neural Gauge Fields (TPU).")
    p.add_argument("-f", "--filename", type=str, default="strawberry.jpeg",
                   help="Image file name inside --images_dir.")
    p.add_argument("--images_dir", type=str, default="images")
    p.add_argument("--should_bw", action="store_true",
                   help="Convert the image to black and white.")
    p.add_argument("-s", "--start_id_param", type=int, default=0,
                   help="First grid-search config id.")
    p.add_argument("-e", "--end_id_param", type=int, default=None,
                   help="Last grid-search config id (inclusive).")
    p.add_argument("-t", "--is_test", action="store_true",
                   help="Test mode: no remote logging.")
    p.add_argument("--epochs", type=int, default=None,
                   help="Override the 5000-epoch budget.")
    p.add_argument("--logger", type=str, default="jsonl",
                   choices=["jsonl", "wandb", "null"])
    p.add_argument("--wandb_entity", type=str,
                   default="dl_project_bussola-fasoli-montagna")
    p.add_argument("--wandb_project", type=str, default="cv_project_final_grid_search")
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("-ewp", "--encoding_weights_path", type=str, default=None)
    p.add_argument("-hwp", "--hpd_weights_path", type=str, default=None)
    p.add_argument("--manifest", type=str, default="runs/grid_manifest.jsonl")
    p.add_argument("--shard-index", type=int, default=0,
                   help="-1 = auto-shard by jax.process_index (multi-host).")
    p.add_argument("--shard-count", type=int, default=1,
                   help="-1 = auto (jax.process_count).")
    p.add_argument("--epoch_span", type=int, default=1,
                   help="Epochs per device call (lax.scan over epochs). >1 "
                        "amortizes host dispatch latency; logging/early-stop "
                        "still evaluate per epoch (see trainer.fit).")
    p.add_argument("--ensemble", type=int, default=1,
                   help=">1: train that many same-shape configs per vmapped "
                        "device program (scalar metrics only; see "
                        "trainer.fit_ensemble).")
    p.add_argument("--platform", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="Force the JAX platform (the environment may pin a "
                        "TPU plugin; 'cpu' overrides it in-process).")
    p.add_argument("--log_image_every", type=int, default=None,
                   help="Log the reconstructed train_image every N epochs "
                        "(the reference logs it EVERY epoch, "
                        "functions.py:718-721 — pass 1 for that cadence; "
                        "default: histogram epochs only).")
    p.add_argument("--scaled", action="store_true",
                   help="InstantNGP-paper-scale tables (T=2^14, 16 levels, "
                        "resolutions 16..512 — BASELINE config 4) instead "
                        "of the reference's T=2^8 x 4 levels.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)

    from .config import ModelConfig, instantngp_scaled_model
    from .data import load_image_dataset
    from .train.grid_search import run_grid_search
    from .utils.logging import make_logger

    image_path = os.path.join(args.images_dir, args.filename)
    if args.scaled:
        model_cfg = instantngp_scaled_model(
            out_channels=1 if args.should_bw else 3,
        )
    else:
        model_cfg = ModelConfig(
            out_channels=1 if args.should_bw else 3,
        )
    data = load_image_dataset(
        image_path, bw=args.should_bw, normalize=not model_cfg.batchnorm_input
    )
    print(f"Image: {image_path} ({data.height}x{data.width}, "
          f"{data.num_pixels} pixels, {data.channels} channels)")

    end_id = args.end_id_param + 1 if args.end_id_param is not None else None
    image_name = os.path.splitext(args.filename)[0]
    stamp = args.wandb_name or time.strftime("%Y%m%d%H%M%S")

    def logger_factory(exp):
        if args.is_test:
            # reference -t shows og-vs-output + histogram panels interactively
            # every epoch (functions.py:696-715); the headless equivalent is a
            # media-saving local log (train image + per-level histogram
            # figures at the histogram cadence + final epoch) plus the
            # end-of-run comparison figure below
            return make_logger(
                "jsonl", path=f"runs/{image_name}_{exp.grid_id}_test.jsonl"
            )
        if args.logger == "null":
            return make_logger("null")
        if args.logger == "wandb":
            from .config import reference_wandb_config

            return make_logger(
                "wandb",
                path=f"runs/{image_name}_{exp.grid_id}.jsonl",
                wandb_kwargs=dict(
                    entity=args.wandb_entity,
                    project=args.wandb_project,
                    group=image_name,
                    name=f"{stamp}_{exp.grid_id}",
                    config=reference_wandb_config(
                        exp, image_name=image_name, bw=args.should_bw
                    ),
                ),
            )
        return make_logger("jsonl", path=f"runs/{image_name}_{exp.grid_id}.jsonl")

    results = run_grid_search(
        data,
        start_id=args.start_id_param,
        end_id=end_id,
        base_model=model_cfg,
        epochs=args.epochs,
        manifest_path=args.manifest,
        logger_factory=logger_factory,
        hpd_weights_path=args.hpd_weights_path,
        encoding_weights_path=args.encoding_weights_path,
        shard_index=None if args.shard_index < 0 else args.shard_index,
        shard_count=None if args.shard_count < 0 else args.shard_count,
        progress=sys.stdout.isatty(),
        epoch_span=args.epoch_span,
        ensemble_size=args.ensemble,
        log_image_every=args.log_image_every,
    )
    for row in results:
        print(f"grid {row['grid_id']}: best PSNR {row['best_psnr']:.3f} "
              f"({row['epochs_run']} epochs)")

    if args.is_test and results:
        # reference test mode shows original-vs-output panels
        # (functions.py:705-713); headless hosts get a saved figure instead
        from .config import experiment_from_grid_id
        from .render import render_image
        from .utils.checkpoint import load_pytree
        from .utils.visualize import save_comparison

        last = results[-1]
        if last.get("run_dir"):
            import numpy as np
            import jax.numpy as jnp
            import jax

            exp = experiment_from_grid_id(last["grid_id"], base_model=model_cfg)
            params = load_pytree(
                os.path.join(last["run_dir"], "whole_model.pkl")
            )
            params = jax.tree_util.tree_map(jnp.asarray, params)
            recon = render_image(
                params, exp.model, height=data.height, width=data.width
            )
            out_path = f"runs/{image_name}_{last['grid_id']}_comparison.png"
            os.makedirs("runs", exist_ok=True)
            save_comparison(data.image.astype(np.uint8), recon, out_path)
            print(f"comparison figure: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
