"""Lp losses for operator learning.

Semantics match the reference ``LpLoss``
(multipole-graph-neural-operator/utilities.py:159-202):

- ``abs(x, y)``: grid-spacing-scaled absolute Lp norm of the difference,
  ``h**(d/p) * ||x - y||_p`` per sample, with ``h = 1/(n-1)``.
- ``rel(x, y)``: relative Lp error ``||x - y||_p / ||y||_p`` per sample.
- reduction: mean (``size_average=True``) or sum.
- ``__call__`` is ``rel``.

All functions are pure jnp and jit/grad-safe. ``rel_masked`` additionally
supports padded node arrays (new capability: the TPU build keeps static
shapes, so eval on padded graphs must exclude padding).
"""
from __future__ import annotations

import jax.numpy as jnp


class LpLoss:
    def __init__(self, d: int = 2, p: int = 2, size_average: bool = True,
                 reduction: bool = True):
        assert d > 0 and p > 0
        self.d = d
        self.p = p
        self.reduction = reduction
        self.size_average = size_average

    def _reduce(self, all_norms):
        if self.reduction:
            if self.size_average:
                return jnp.mean(all_norms)
            return jnp.sum(all_norms)
        return all_norms

    def abs(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        num = x.shape[0]
        h = 1.0 / (x.shape[1] - 1.0)
        diff = (x.reshape(num, -1) - y.reshape(num, -1))
        norms = (h ** (self.d / self.p)) * _lp_norm(diff, self.p)
        return self._reduce(norms)

    def rel(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        num = x.shape[0]
        diff_norms = _lp_norm(x.reshape(num, -1) - y.reshape(num, -1), self.p)
        y_norms = _lp_norm(y.reshape(num, -1), self.p)
        return self._reduce(diff_norms / y_norms)

    def rel_masked(self, x, y, mask):
        """Relative Lp error over valid entries only.

        mask: [batch, n] (or broadcastable) with 1.0 at valid nodes.
        """
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        num = x.shape[0]
        m = jnp.broadcast_to(jnp.asarray(mask, x.dtype), x.shape)
        diff = (x - y) * m
        ym = y * m
        diff_norms = _lp_norm(diff.reshape(num, -1), self.p)
        y_norms = _lp_norm(ym.reshape(num, -1), self.p)
        return self._reduce(diff_norms / y_norms)

    def __call__(self, x, y):
        return self.rel(x, y)


def _lp_norm(x, p):
    if p == 2:
        return jnp.sqrt(jnp.sum(x * x, axis=1))
    return jnp.sum(jnp.abs(x) ** p, axis=1) ** (1.0 / p)


def l1_loss(pred, target, mask=None):
    """Sum of absolute errors (the GKN backward loss,
    graph-neural-operator/UAI1_full_resolution.py:265)."""
    diff = jnp.abs(pred.reshape(-1) - target.reshape(-1))
    if mask is not None:
        diff = diff * mask.reshape(-1)
    return jnp.sum(diff)


def mse_loss(pred, target, mask=None):
    """Mean squared error (the GKN UAI3 backward loss,
    graph-neural-operator/UAI3_resolution.py:223)."""
    diff = (pred.reshape(-1) - target.reshape(-1)) ** 2
    if mask is None:
        return jnp.mean(diff)
    m = mask.reshape(-1)
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m), 1.0)


__all__ = ["LpLoss", "l1_loss", "mse_loss"]
