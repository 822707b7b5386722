"""Masked reductions over padded node/token axes.

These replace PyG's ``global_{mean,add,max}_pool`` scatter ops (reference:
trainer/train_mpnn.py:82-89). With dense padded batches the pools become
masked reductions over a static axis — no scatter, fully fusable by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Sum over ``axis`` counting only mask==True positions.

    x: [..., N, F], mask: [..., N] broadcast over trailing feature dims.
    """
    m = jnp.expand_dims(mask, -1).astype(x.dtype)
    return jnp.sum(x * m, axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    m = jnp.expand_dims(mask, -1).astype(x.dtype)
    s = jnp.sum(x * m, axis=axis)
    n = jnp.clip(jnp.sum(m, axis=axis), 1.0, None)
    return s / n


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    neg = jnp.finfo(x.dtype).min
    m = jnp.expand_dims(mask, -1)
    return jnp.max(jnp.where(m, x, neg), axis=axis)
