"""MAE / MSE metrics (reference src/metrics/vqvae.py:61-124)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mae", "mse"]


def mae(y_pred: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(jnp.asarray(y_pred, jnp.float32) - jnp.asarray(y, jnp.float32)))


def mse(y_pred: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(jnp.asarray(y_pred, jnp.float32) - jnp.asarray(y, jnp.float32)))
