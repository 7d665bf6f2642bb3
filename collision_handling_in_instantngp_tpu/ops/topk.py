"""Straight-through differentiable top-k.

TPU-native equivalent of the reference's ``DifferentiableTopk`` autograd.Function
(models.py:5-42): forward is a plain top-k over the slot axis (largest, sorted);
backward scatters the incoming ``grad_values`` into a zeros tensor over the full
slot axis at the selected indices ("straight-through": gradient flows only to the
selected slots, all other slots get zero).

Implemented with ``jax.custom_vjp`` so the dense (..., T) probability tensor is
NOT a saved residual — only the (..., K) indices are kept, and the backward
builds the dense gradient with one scatter. ``jnp.put_along_axis`` is safe here
because top-k indices are unique within a row.

The reference's ``should_inplace_scatter=None`` variant discards the scatter
result (models.py:31), making the backward identically zero; that behavioral
quirk is reproduced by :func:`differentiable_topk_noop_grad` for parity
experiments (see config.TopkScatterMode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def differentiable_topk(
    x: jnp.ndarray, k: int, num_slots: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over the last axis with straight-through backward.

    Args:
      x: (..., num_slots) scores (probabilities in the GNGF use).
      k: number of entries to keep.
      num_slots: static size of the last axis (needed to rebuild the dense
        gradient in the backward without saving the dense input).

    Returns:
      values:  (..., K) sorted descending (torch.topk ``largest=True,
               sorted=True`` semantics, reference models.py:11).
      indices: (..., K) int32 slot ids.
    """
    values, indices = jax.lax.top_k(x, k)
    return values, indices


def _topk_fwd(x: jnp.ndarray, k: int, num_slots: int):
    values, indices = jax.lax.top_k(x, k)
    return (values, indices), indices


def _topk_bwd(k: int, num_slots: int, indices, cotangents):
    del k
    grad_values, _grad_indices = cotangents  # grad wrt int indices is dropped
    dense_shape = indices.shape[:-1] + (num_slots,)
    grad_x = jnp.put_along_axis(
        jnp.zeros(dense_shape, dtype=grad_values.dtype),
        indices,
        grad_values,
        axis=-1,
        inplace=False,
    )
    return (grad_x,)


differentiable_topk.defvjp(_topk_fwd, _topk_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def differentiable_topk_noop_grad(
    x: jnp.ndarray, k: int, num_slots: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference quirk path (``should_inplace_scatter=None``, models.py:30-31):
    identical forward, but the backward is all-zeros because the reference
    discards the out-of-place scatter result."""
    return jax.lax.top_k(x, k)


def _topk_noop_fwd(x: jnp.ndarray, k: int, num_slots: int):
    values, indices = jax.lax.top_k(x, k)
    return (values, indices), indices


def _topk_noop_bwd(k: int, num_slots: int, indices, cotangents):
    del k
    grad_values, _ = cotangents
    dense_shape = indices.shape[:-1] + (num_slots,)
    return (jnp.zeros(dense_shape, dtype=grad_values.dtype),)


differentiable_topk_noop_grad.defvjp(_topk_noop_fwd, _topk_noop_bwd)
