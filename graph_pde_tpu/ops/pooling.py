"""1-d inter-level transfer ops for the orthogonal MGKN.

XLA-native (reshape-based) equivalents of the reference's
``F.upsample(mode='nearest')`` / ``F.avg_pool1d`` transfers
(multipole-graph-neural-operator/MGKN_orthogonal_burgers1d.py:46-57).
Layout is [n, channels] (node-major), matching the model's node arrays.
"""
from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest_1d(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """[n, c] -> [n*scale, c], nearest-neighbor repeat."""
    n, c = x.shape
    return jnp.broadcast_to(x[:, None, :], (n, scale, c)).reshape(n * scale, c)


def avg_pool_1d(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """[n, c] -> [n//scale, c], non-overlapping mean pooling."""
    n, c = x.shape
    return x.reshape(n // scale, scale, c).mean(axis=1)


__all__ = ["upsample_nearest_1d", "avg_pool_1d"]
