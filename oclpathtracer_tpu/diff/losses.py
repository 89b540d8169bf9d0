"""Image losses for inverse rendering."""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all pixels/channels."""
    d = img - target
    return jnp.mean(d * d)


def l2_loss(img: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sum (not mean) of squared error — the shard-local form; psum then divide."""
    d = img - target
    return jnp.sum(d * d)
