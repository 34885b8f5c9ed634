"""Data normalizers.

Semantics match the reference normalizers
(multipole-graph-neural-operator/utilities.py:72-156):

- ``UnitGaussianNormalizer``: per-location z-score with stats over axis 0
  of the training set; ``decode`` optionally gathers stats at ``sample_idx``
  (Nystrom-subsampled outputs), including the T x batch x n case.
- ``GaussianNormalizer``: scalar (global) z-score.
- ``RangeNormalizer``: per-dimension min/max scaling to [low, high].

Standard deviations use the unbiased (ddof=1) estimator to match
``torch.std``. The epsilon placement is ``(std + eps)``, exactly as the
reference (utilities.py:82-98).

These are host/jnp hybrid objects: stats are computed eagerly on
construction (from numpy or jax arrays) and encode/decode are pure jnp
functions that can be traced inside jit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _std_ddof1(x, axis=None):
    x = jnp.asarray(x)
    return jnp.std(x, axis=axis, ddof=1)


class UnitGaussianNormalizer:
    """Pointwise Gaussian normalizer: stats per grid location (axis 0)."""

    def __init__(self, x, eps: float = 1e-5):
        x = jnp.asarray(x)
        self.mean = jnp.mean(x, axis=0)
        self.std = _std_ddof1(x, axis=0)
        self.eps = eps

    def encode(self, x):
        return (jnp.asarray(x) - self.mean) / (self.std + self.eps)

    def decode(self, x, sample_idx=None):
        x = jnp.asarray(x)
        if sample_idx is None:
            std = self.std + self.eps
            mean = self.mean
        else:
            sample_idx = jnp.asarray(sample_idx)
            if self.mean.ndim == sample_idx[0].ndim:
                # mean: [n]; sample_idx: [batch, m] -> stats [batch, m]
                std = self.std[sample_idx] + self.eps
                mean = self.mean[sample_idx]
            else:
                # mean: [T, n]; sample_idx: [batch, m] -> stats [T, batch, m]
                std = self.std[:, sample_idx] + self.eps
                mean = self.mean[:, sample_idx]
        return x * std + mean

    # Device-movement is a no-op in JAX (arrays are committed on use);
    # kept for API familiarity.
    def cuda(self):  # pragma: no cover - compatibility shim
        return self

    def cpu(self):  # pragma: no cover - compatibility shim
        return self


class GaussianNormalizer:
    """Global scalar Gaussian normalizer."""

    def __init__(self, x, eps: float = 1e-5):
        x = jnp.asarray(x)
        self.mean = jnp.mean(x)
        self.std = _std_ddof1(x)
        self.eps = eps

    def encode(self, x):
        return (jnp.asarray(x) - self.mean) / (self.std + self.eps)

    def decode(self, x, sample_idx=None):
        return jnp.asarray(x) * (self.std + self.eps) + self.mean


class RangeNormalizer:
    """Per-dimension min/max scaling onto [low, high]."""

    def __init__(self, x, low: float = 0.0, high: float = 1.0):
        x = jnp.asarray(x)
        flat = x.reshape(x.shape[0], -1)
        mymin = jnp.min(flat, axis=0)
        mymax = jnp.max(flat, axis=0)
        self.a = (high - low) / (mymax - mymin)
        self.b = -self.a * mymax + high

    def encode(self, x):
        x = jnp.asarray(x)
        s = x.shape
        out = self.a * x.reshape(s[0], -1) + self.b
        return out.reshape(s)

    def decode(self, x):
        x = jnp.asarray(x)
        s = x.shape
        out = (x.reshape(s[0], -1) - self.b) / self.a
        return out.reshape(s)


__all__ = [
    "UnitGaussianNormalizer",
    "GaussianNormalizer",
    "RangeNormalizer",
]
