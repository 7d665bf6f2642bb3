"""Image dataset: full coordinate grid + normalized pixel targets.

TPU-native equivalent of reference ``MyDataset`` (utils.py:5-75) plus the
coordinate normalization and shuffle permutations done in the reference CLI
(main.py:50-58). The whole image is one "item": X is every (row, col) pair from
a meshgrid with ``indexing='ij'`` (utils.py:56-59), Y is pixels/255
(utils.py:61). Decoding uses cv2 BGR->RGB (or grayscale) exactly like the
reference so pixel values are bit-identical.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover - env without opencv
    from PIL import Image
    _HAS_CV2 = False


@dataclasses.dataclass
class ImageData:
    coords: np.ndarray       # (P, 2) float32 normalized [0,1] (row, col) pairs
    targets: np.ndarray      # (P, C) float32 pixels / 255
    height: int
    width: int
    image: np.ndarray        # original uint8 (h, w[, 3]) image
    name: str

    @property
    def num_pixels(self) -> int:
        return self.height * self.width

    @property
    def channels(self) -> int:
        return self.targets.shape[1]


def load_image(path: str, bw: bool = False) -> np.ndarray:
    """uint8 RGB (h, w, 3) or grayscale (h, w) image (reference utils.py:46-51)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"image not found: {path}")
    if _HAS_CV2:
        raw = cv2.imread(path)
        if raw is None:
            raise ValueError(f"cv2 could not decode image: {path}")
        img = raw[:, :, :3]  # keep rgb in case of rgba
        code = cv2.COLOR_BGR2GRAY if bw else cv2.COLOR_BGR2RGB
        return cv2.cvtColor(img, code)
    img = Image.open(path)
    img = img.convert("L" if bw else "RGB")
    return np.asarray(img)


def make_coordinate_grid(height: int, width: int) -> np.ndarray:
    """(h*w, 2) int coords in row-major (ij) order (reference utils.py:56-59)."""
    return np.stack(
        np.meshgrid(np.arange(height), np.arange(width), indexing="ij"), axis=-1
    ).reshape(-1, 2)


def load_image_dataset(
    path: str, bw: bool = False, normalize: bool = True
) -> ImageData:
    """Load an image as a coordinate-regression dataset.

    normalize=True divides coords by ``max(w, h) - 1`` (reference main.py:50-51);
    pass False when the model batch-normalizes its input instead
    (``should_batchnorm_data``, params.py:5).
    """
    img = load_image(path, bw)
    h, w = img.shape[0], img.shape[1]
    coords = make_coordinate_grid(h, w).astype(np.float32)
    if normalize:
        coords = coords / (max(w, h) - 1)
    targets = (img.reshape(h * w, -1).astype(np.float32)) / 255.0
    return ImageData(
        coords=coords,
        targets=targets,
        height=h,
        width=w,
        image=img.astype(np.int64),
        name=os.path.basename(path),
    )


def make_shuffle_permutations(
    num_pixels: int, seed: int, shuffle: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """(shuffled_indices, reordered_indices) — the fixed permutation built once
    before training and its inverse (reference main.py:56-58). The reference
    never re-shuffles between epochs; neither do we."""
    if shuffle:
        rng = np.random.default_rng(seed)
        shuffled = rng.permutation(num_pixels).astype(np.int32)
    else:
        shuffled = np.arange(num_pixels, dtype=np.int32)
    reordered = np.zeros(num_pixels, dtype=np.int32)
    reordered[shuffled] = np.arange(num_pixels, dtype=np.int32)
    return shuffled, reordered
