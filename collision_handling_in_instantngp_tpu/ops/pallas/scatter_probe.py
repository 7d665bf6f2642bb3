"""Experimental in-VMEM serial scatter-add (T, C) accumulator — a probe
candidate for the blend's table-gradient segment-sum (RESULTS r3: XLA
`segment_sum` 22.5 ms at the scaled shape; argsort+sorted 54.1 ms; the
round-2 S-matrix one-hot 51 ms).

Idea: the (T, C) = (16384, 32) accumulator is only 2 MB — small enough to
sit in VMEM for the whole reduction, so each of the N=U*K rows is ONE
VMEM read-modify-write at its slot instead of whatever sorted/looped
lowering XLA picks through HBM. The grid streams row chunks; the output
block is revisited (constant index_map) so the accumulation crosses grid
steps without HBM round-trips. The inner loop is inherently serial (one
dynamic row update per step) — this probe exists to MEASURE what that
costs on a v5e core, not to presume it wins. Not wired into training;
see tools/gather_probe.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, rows_ref, out_ref, *, chunk: int):
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(r, _):
        t = idx_ref[r]
        out_ref[pl.ds(t, 1), :] = out_ref[pl.ds(t, 1), :] + rows_ref[
            pl.ds(r, 1), :
        ]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def scatter_add_vmem(
    rows: jnp.ndarray, idx: jnp.ndarray, t: int,
    chunk: int = 8192, interpret: bool = False,
) -> jnp.ndarray:
    """segment_sum(rows, idx, num_segments=t) via a VMEM-resident serial
    accumulator. rows (N, C) float32, idx (N,) int32 in [0, t)."""
    n, c = rows.shape
    pad = (-n) % chunk
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        # padded rows scatter zeros into slot 0 — harmless
        idx = jnp.pad(idx, (0, pad))
    grid = rows.shape[0] // chunk
    return pl.pallas_call(
        functools.partial(_scatter_kernel, chunk=chunk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda ci: (ci,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, c), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, c), lambda ci: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32), rows.astype(jnp.float32))
