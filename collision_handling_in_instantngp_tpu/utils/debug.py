"""Numerical-sanity debug mode.

The reference's only numerical guard is ``nan_to_num`` on the HPD probs
(models.py:111) plus print-based debugging (functions.py:69-77). The TPU
rebuild adds a real debug mode: ``checkify_step`` wraps any jitted step
function with jax.experimental.checkify NaN/div-by-zero checks, so a run can
be re-executed in debug mode to localize a non-finite intermediate instead of
watching the loss turn NaN."""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.experimental import checkify


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a step function with float checks. The wrapped function returns
    ``(error, outputs)``; call ``error.throw()`` (host-side) to raise on the
    first NaN/Inf with its provenance."""
    checked = checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.div_checks
    )
    return jax.jit(checked)


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite check over a pytree (debug/test helper)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
