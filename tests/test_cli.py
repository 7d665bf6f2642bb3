"""CLI end-to-end smoke test: subprocess invocation on a generated tiny image,
forced CPU platform (reference main.py CLI surface)."""

import json
import os
import subprocess
import sys

import numpy as np


def test_cli_tiny_run(tmp_path, rng):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    img = rng.integers(0, 256, size=(9, 12, 3)).astype(np.uint8)
    cv2.imwrite(str(img_dir / "tiny.png"), img)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    out = subprocess.run(
        [
            sys.executable, "-m", "collision_handling_in_instantngp_tpu.cli",
            "-f", "tiny.png", "--images_dir", str(img_dir),
            "-s", "0", "-e", "0", "--epochs", "3", "--platform", "cpu",
            "--manifest", str(tmp_path / "m.jsonl"),
            "--logger", "jsonl",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "grid 0: best PSNR" in out.stdout
    rows = [
        json.loads(l) for l in open(tmp_path / "m.jsonl") if l.strip()
    ]
    assert rows[0]["grid_id"] == 0 and rows[0]["epochs_run"] == 3
    # jsonl per-epoch log written
    log = tmp_path / "runs" / "tiny_0.jsonl"
    assert log.exists() and len(open(log).readlines()) == 3
