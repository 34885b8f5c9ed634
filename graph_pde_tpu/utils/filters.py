"""Separable Gaussian smoothing on regular grids.

TPU-native equivalent of ``scipy.ndimage.gaussian_filter`` as used by the
reference assemble paths (multipole-graph-neural-operator/utilities.py:1148
``mode='constant'``, :1403/:1436 ``mode='wrap'``). Matches scipy's kernel
construction: truncation radius ``int(truncate * sigma + 0.5)`` and a
normalized sampled Gaussian.

Implemented as a sum of shifted slices over a padded array -- pure jnp,
jit-safe, static shapes.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return (phi / phi.sum()).astype(np.float32)


def gaussian_filter1d(x, sigma: float, axis: int = -1, mode: str = "constant",
                      truncate: float = 4.0):
    x = jnp.asarray(x)
    radius = int(truncate * float(sigma) + 0.5)
    if radius == 0:
        return x
    w = _gaussian_kernel1d(sigma, radius)
    axis = axis % x.ndim
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    if mode == "constant":
        xp = jnp.pad(x, pad, mode="constant", constant_values=0.0)
    elif mode == "wrap":
        xp = jnp.pad(x, pad, mode="wrap")
    elif mode == "reflect":
        xp = jnp.pad(x, pad, mode="symmetric")
    elif mode == "nearest":
        xp = jnp.pad(x, pad, mode="edge")
    else:
        raise ValueError(f"unsupported mode: {mode}")
    n = x.shape[axis]
    out = jnp.zeros_like(x)
    for k in range(2 * radius + 1):
        sl = lax.slice_in_dim(xp, k, k + n, axis=axis)
        out = out + w[k] * sl
    return out


def gaussian_filter(x, sigma: float, mode: str = "constant",
                    truncate: float = 4.0):
    """N-d separable Gaussian filter (all axes), scipy-compatible."""
    x = jnp.asarray(x)
    for ax in range(x.ndim):
        x = gaussian_filter1d(x, sigma, axis=ax, mode=mode, truncate=truncate)
    return x


__all__ = ["gaussian_filter", "gaussian_filter1d"]
