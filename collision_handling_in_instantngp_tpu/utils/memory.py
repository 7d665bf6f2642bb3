"""Device-memory watermark logging.

TPU-native analog of the reference's ``print_allocated_memory``
(functions.py:80-93), which printed ``torch.cuda.memory_allocated`` plus the
calling source line at ~35 watermark points. Here the same capability reads
JAX's per-device memory stats; call sites opt in with a tag instead of relying
on stack inspection (kept available via ``tag=None``)."""

from __future__ import annotations

import traceback
from typing import Dict, Optional

import jax

_GB = 1024**3


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """bytes_in_use / peak_bytes_in_use / bytes_limit in GB (0.0 where the
    backend does not report — CPU typically doesn't)."""
    device = device or jax.devices()[0]
    stats = {}
    try:
        raw = device.memory_stats() or {}
    except Exception:
        raw = {}
    for key, out in (
        ("bytes_in_use", "allocated_gb"),
        ("peak_bytes_in_use", "peak_gb"),
        ("bytes_limit", "limit_gb"),
    ):
        stats[out] = raw.get(key, 0) / _GB
    return stats


def print_allocated_memory(
    tag: Optional[str] = None, log: bool = False
) -> Optional[Dict[str, float]]:
    """Gated watermark print (reference semantics: no-op unless enabled,
    params.py:23 should_log_allocated_memory)."""
    if not log:
        return None
    if tag is None:
        frame = traceback.extract_stack()[-2]
        tag = f"{frame.filename}:{frame.lineno}"
    stats = device_memory_stats()
    print(
        f"[mem] {tag}: allocated {stats['allocated_gb']:.2f} GB, "
        f"peak {stats['peak_gb']:.2f} GB"
    )
    return stats
