"""The S-matrix (selection-matrix) blend form used at scaled tables vs the
fused-gather form (models/encoding.py:_blend_core_impl). The S-form exists
because the gather form materializes a (U, L, K, F) value whose F-on-lanes
TPU tiling pads 64x (measured 8.06 GB HBM temp at T=2^14 — an OOM); both
forms must agree in values and in every VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collision_handling_in_instantngp_tpu.models import encoding as enc

L, T, F, U, K = 3, 64, 2, 301, 4  # U deliberately not a chunk multiple


def _setup(rng):
    tables = jnp.asarray(rng.standard_normal((L, T, F)).astype(np.float32))
    idx = jnp.asarray(
        np.stack(
            [rng.choice(T, size=K, replace=False) for _ in range(U)]
        ).astype(np.int32)
    )
    w = jnp.asarray(rng.standard_normal((U, K)).astype(np.float32))
    return tables, idx, w


@pytest.fixture
def smatrix_forced(monkeypatch):
    """Force the S-matrix path (the gate targets u*t at scaled configs)."""
    monkeypatch.setattr(enc, "_BLEND_SMATRIX_MIN_ELEMENTS", 0)
    monkeypatch.setattr(enc, "BLEND_LARGE_BACKEND", "smatrix")
    # small chunk so the scan takes several steps incl. a padded tail
    monkeypatch.setattr(enc, "_BLEND_CHUNK_BUDGET", 128 * T)


@pytest.fixture
def gather_forced(monkeypatch):
    """Force the large-regime GATHER path (round-3 default backend: row
    gather + K-weighted sum fwd, segment-sum table grad bwd)."""
    monkeypatch.setattr(enc, "_BLEND_SMATRIX_MIN_ELEMENTS", 0)
    monkeypatch.setattr(enc, "BLEND_LARGE_BACKEND", "gather")


def test_gather_backend_forward_matches_oracle(rng, gather_forced):
    tables, idx, w = _setup(rng)
    out_gather = enc._blend_core(tables, idx, w)
    gathered = jnp.take(
        tables.reshape(L * T, F),
        idx[:, None, :] + (jnp.arange(L) * T)[None, :, None],
        axis=0,
    )                                                          # (U, L, K, F)
    out_ref = jnp.einsum("ulkf,uk->luf", gathered, w)
    np.testing.assert_allclose(
        np.asarray(out_gather), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )


def test_gather_backend_vjp_matches_oracle(rng, gather_forced):
    tables, idx, w = _setup(rng)
    g = jnp.asarray(rng.standard_normal((L, U, F)).astype(np.float32))

    def loss_custom(tables, w):
        return jnp.sum(enc._blend_core(tables, idx, w) * g)

    def loss_ref(tables, w):
        gathered = jnp.take(
            tables.reshape(L * T, F),
            idx[:, None, :] + (jnp.arange(L) * T)[None, :, None],
            axis=0,
        )
        return jnp.sum(jnp.einsum("ulkf,uk->luf", gathered, w) * g)

    gt_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(tables, w)
    gt_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(tables, w)
    np.testing.assert_allclose(
        np.asarray(gt_c), np.asarray(gt_r), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gw_c), np.asarray(gw_r), rtol=1e-5, atol=1e-6
    )


def test_smatrix_forward_matches_gather(rng, smatrix_forced):
    tables, idx, w = _setup(rng)
    out_s = enc._blend_core(tables, idx, w)
    # gather-form oracle computed directly
    gathered = jnp.take(
        tables.reshape(L * T, F),
        idx[:, None, :] + (jnp.arange(L) * T)[None, :, None],
        axis=0,
    )                                                          # (U, L, K, F)
    out_ref = jnp.einsum("ulkf,uk->luf", gathered, w)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )


def test_smatrix_vjp_matches_gather(rng, smatrix_forced):
    tables, idx, w = _setup(rng)
    g = jnp.asarray(rng.standard_normal((L, U, F)).astype(np.float32))

    def loss_custom(tables, w):
        return jnp.sum(enc._blend_core(tables, idx, w) * g)

    def loss_ref(tables, w):
        gathered = jnp.take(
            tables.reshape(L * T, F),
            idx[:, None, :] + (jnp.arange(L) * T)[None, :, None],
            axis=0,
        )
        return jnp.sum(jnp.einsum("ulkf,uk->luf", gathered, w) * g)

    dt_c, dw_c = jax.grad(loss_custom, argnums=(0, 1))(tables, w)
    dt_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(tables, w)
    np.testing.assert_allclose(
        np.asarray(dw_c), np.asarray(dw_r), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dt_c), np.asarray(dt_r), rtol=1e-4, atol=1e-5
    )


def test_gather_form_vjp_unchanged(rng):
    """The small-table path (flagship) after the residual rework: dw/dt still
    match autodiff through the plain gather composition."""
    tables, idx, w = _setup(rng)
    g = jnp.asarray(rng.standard_normal((L, U, F)).astype(np.float32))

    def loss_custom(tables, w):
        return jnp.sum(enc._blend_core(tables, idx, w) * g)

    def loss_ref(tables, w):
        gathered = jnp.take(
            tables.reshape(L * T, F),
            idx[:, None, :] + (jnp.arange(L) * T)[None, :, None],
            axis=0,
        )
        return jnp.sum(jnp.einsum("ulkf,uk->luf", gathered, w) * g)

    dt_c, dw_c = jax.grad(loss_custom, argnums=(0, 1))(tables, w)
    dt_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(tables, w)
    np.testing.assert_allclose(
        np.asarray(dw_c), np.asarray(dw_r), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dt_c), np.asarray(dt_r), rtol=1e-4, atol=1e-5
    )


@pytest.fixture
def vmem_scatter_forced(monkeypatch):
    """Gather backend with the Pallas VMEM-serial table-grad reduction
    (interpret mode — CPU twin of the TPU kernel)."""
    monkeypatch.setattr(enc, "_BLEND_SMATRIX_MIN_ELEMENTS", 0)
    monkeypatch.setattr(enc, "BLEND_LARGE_BACKEND", "gather")
    monkeypatch.setattr(enc, "BLEND_SCATTER_BACKEND", "vmem_serial")
    monkeypatch.setattr(enc, "BLEND_SCATTER_INTERPRET", True)


def test_vmem_scatter_vjp_matches_oracle(rng, vmem_scatter_forced):
    """The vmem_serial table-grad backend must reproduce the segment-sum
    gradients (different accumulation order — fp32 tolerance, not bitwise;
    idx rows here include duplicate slots across rows, exercising the
    read-modify-write accumulation)."""
    tables, idx, w = _setup(rng)
    g = jnp.asarray(rng.standard_normal((L, U, F)).astype(np.float32))

    def loss_custom(tables, w):
        return jnp.sum(enc._blend_core(tables, idx, w) * g)

    def loss_ref(tables, w):
        gathered = jnp.take(
            tables.reshape(L * T, F),
            idx[:, None, :] + (jnp.arange(L) * T)[None, :, None],
            axis=0,
        )
        return jnp.sum(jnp.einsum("ulkf,uk->luf", gathered, w) * g)

    dt_c, dw_c = jax.grad(loss_custom, argnums=(0, 1))(tables, w)
    dt_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(tables, w)
    np.testing.assert_allclose(
        np.asarray(dt_c), np.asarray(dt_r), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dw_c), np.asarray(dw_r), rtol=1e-5, atol=1e-6
    )
