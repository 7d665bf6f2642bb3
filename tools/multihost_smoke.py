"""Real multi-process execution smoke test (VERDICT r2 #4).

Round 2 validated every multi-device path on single-process fake meshes; this
tool executes the ACTUAL multi-host code — ``jax.distributed.initialize`` via
``parallel.mesh.initialize_distributed``, a global (data, model) mesh spanning
two OS processes, a DP epoch whose loss must match the single-process run,
and the grid driver's ``process_index`` config sharding — on a 2-process CPU
cluster (each process contributes 2 CPU devices; collectives cross process
boundaries through the distributed runtime, the same wiring a multi-host TPU
pod uses over DCN; SURVEY.md §2.4/§5.8).

Usage:
  python tools/multihost_smoke.py                 # parent: spawns 2 children
  python tools/multihost_smoke.py --role child ...  # (internal)

Prints "MULTIHOST SMOKE OK ..." and exits 0 on success.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_PROCESSES = 2
LOCAL_DEVICES = 2
EPOCHS = 2
GRID_IDS = (4060, 4061, 4062, 4063)


def _tiny_setup():
    """Deterministic tiny image + small config (host-only, no jax)."""
    import dataclasses

    import numpy as np

    from collision_handling_in_instantngp_tpu.config import (
        experiment_from_grid_id,
    )
    from collision_handling_in_instantngp_tpu.data import ImageData

    rng = np.random.default_rng(0)
    h, w = 12, 9
    img = rng.integers(0, 256, size=(h, w, 3))
    coords = (
        np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1)
        .reshape(-1, 2)
        .astype(np.float32)
        / (max(h, w) - 1)
    )
    data = ImageData(
        coords=coords,
        targets=(img.reshape(-1, 3) / 255.0).astype(np.float32),
        height=h,
        width=w,
        image=img.astype(np.int64),
        name="tiny.png",
    )
    exp = experiment_from_grid_id(4061)
    exp = dataclasses.replace(
        exp,
        model=dataclasses.replace(
            exp.model, hash_table_size=32, hpd_hidden=(8, 16),
            mlp_hidden=(16,),
        ),
        train=dataclasses.replace(
            exp.train, epochs=EPOCHS, save_params=False,
        ),
    )
    return data, exp


def _epoch_losses(data, exp, mesh=None):
    """Run EPOCHS DP epochs; with a mesh, inputs are sharded onto it."""
    import jax

    from collision_handling_in_instantngp_tpu.data import (
        make_shuffle_permutations,
    )
    from collision_handling_in_instantngp_tpu.models import gngf
    from collision_handling_in_instantngp_tpu.parallel.train_parallel import (
        make_parallel_epoch,
    )
    from collision_handling_in_instantngp_tpu.train.train_step import (
        build_epoch_batches,
    )

    statics = gngf.make_statics(exp.model)
    shuffled, _ = make_shuffle_permutations(
        data.num_pixels, exp.train.seed, exp.train.shuffle_pixels
    )
    batches = build_epoch_batches(
        data.coords, data.targets, exp.train.batch_fraction, shuffled,
        og_image=data.image, model_cfg=exp.model, statics=statics,
    )
    init, place, mesh = make_parallel_epoch(
        exp, statics, data.num_pixels, mesh=mesh
    )
    state, epoch_fn = init(jax.random.PRNGKey(exp.train.seed))
    state, batches = place(state, batches)
    losses = []
    for _ in range(EPOCHS):
        state, metrics, _ = epoch_fn(state, batches)
        losses.append(float(metrics.loss))
    return losses


def run_child(coordinator: str, process_id: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)

    from collision_handling_in_instantngp_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
    )

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    assert len(jax.devices()) == NUM_PROCESSES * LOCAL_DEVICES

    data, exp = _tiny_setup()

    # 1) DP epoch over the GLOBAL mesh (both processes' devices): GSPMD
    # shards the pixel rows across the 4 cross-process devices
    mesh = make_mesh(jax.devices())
    losses = _epoch_losses(data, exp, mesh=mesh)

    # 2) grid driver's multi-host auto-sharding (shard_index=None ->
    # ids[jax.process_index()::jax.process_count()])
    from collision_handling_in_instantngp_tpu.train.grid_search import (
        run_grid_search,
    )

    manifest = os.path.join(
        os.path.dirname(out_path), f"manifest_p{process_id}.jsonl"
    )
    rows = run_grid_search(
        data, GRID_IDS[0], GRID_IDS[-1] + 1,
        base_model=exp.model, base_train=exp.train, epochs=EPOCHS,
        manifest_path=manifest, shard_index=None, shard_count=None,
        verbose=False,
    )
    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "losses": losses,
                "grid_ids_run": sorted(r["grid_id"] for r in rows),
            },
            f,
        )


def run_parent() -> None:
    # expected loss from a plain single-process run (parent stays
    # single-process: children are spawned BEFORE any jax import here)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"out_{i}.json") for i in range(NUM_PROCESSES)]
        env = dict(os.environ)
        procs = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--role", "child", "--coordinator", coordinator,
                    "--process-id", str(i), "--out", outs[i],
                ],
                env=env, cwd=REPO,
            )
            for i in range(NUM_PROCESSES)
        ]
        rcs = [p.wait(timeout=900) for p in procs]
        assert all(rc == 0 for rc in rcs), f"child exit codes {rcs}"
        results = []
        for o in outs:
            with open(o) as f:
                results.append(json.load(f))

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Pin to ONE device: an inherited --xla_force_host_platform_device_count
    # (e.g. from the test suite's env) would otherwise turn this "unsharded"
    # reference run into an N-device mesh whose batch constraint (pixel count
    # divisible by N) the tiny image can't satisfy.
    jax.config.update("jax_num_cpu_devices", 1)
    data, exp = _tiny_setup()
    expected = _epoch_losses(data, exp)

    for r in results:
        assert r["process_count"] == NUM_PROCESSES, r
        assert r["global_devices"] == NUM_PROCESSES * LOCAL_DEVICES, r
        # every process sees the SAME replicated loss, equal to the
        # single-process run (DP-invariance across real process boundaries)
        for got, want in zip(r["losses"], expected):
            assert abs(got - want) < 1e-6, (r["losses"], expected)
    # config sharding: disjoint id sets covering the range, interleaved
    ids0, ids1 = results[0]["grid_ids_run"], results[1]["grid_ids_run"]
    assert ids0 == [GRID_IDS[0], GRID_IDS[2]], ids0
    assert ids1 == [GRID_IDS[1], GRID_IDS[3]], ids1
    print(
        f"MULTIHOST SMOKE OK: {NUM_PROCESSES} processes x {LOCAL_DEVICES} "
        f"devices, DP losses {results[0]['losses']} == single-process "
        f"{expected}, grid shards {ids0} | {ids1}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="parent", choices=["parent", "child"])
    ap.add_argument("--coordinator")
    ap.add_argument("--process-id", type=int)
    ap.add_argument("--out")
    args = ap.parse_args()
    if args.role == "child":
        run_child(args.coordinator, args.process_id, args.out)
    else:
        run_parent()


if __name__ == "__main__":
    main()
