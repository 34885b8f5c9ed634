"""Task adapters binding each model family to the generic trainer."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .trainer import Task
from ..models.gkn import GKNConfig, gkn_apply, gkn_apply_batched
from ..models.gcn import GCNConfig, gcn_apply
from ..models.mgkn_general import MGKNGeneralConfig, mgkn_general_apply
from ..models.mgkn_orthogonal import (
    MGKNOrthogonalConfig, mgkn_orthogonal_apply,
)


def _node_mask_batched(graphs):
    n_pad = graphs.x.shape[-2]
    return jnp.arange(n_pad)[None, :] < graphs.n_node[:, None]


class _NormalizerDecodeMixin:
    """Decode via a fitted normalizer, gathering per-node stats at
    sample_idx for Nystrom-subsampled outputs (utilities.py:85-99)."""

    u_normalizer = None
    use_sample_idx = True

    def decode(self, values, batch):
        if self.u_normalizer is None:
            return values
        idx = getattr(batch, "sample_idx", None)
        if self.use_sample_idx and idx is not None:
            return self.u_normalizer.decode(values, sample_idx=idx)
        return self.u_normalizer.decode(values)


class GKNTask(_NormalizerDecodeMixin, Task):
    def __init__(self, cfg: GKNConfig, u_normalizer=None, loss_type="l1",
                 use_sample_idx=True):
        self.cfg = cfg
        self.u_normalizer = u_normalizer
        self.loss_type = loss_type
        self.use_sample_idx = use_sample_idx

    def forward(self, params, batch):
        return gkn_apply_batched(params, self.cfg, batch)

    def mask(self, batch):
        return _node_mask_batched(batch)


class GCNTask(_NormalizerDecodeMixin, Task):
    """``template``: a Graph whose edge structure is shared by every
    sample (the full-grid lattice, neurips4_GCN.py:133); batches are
    then ``NodeBatch``es carrying only per-sample node data and the
    template's senders/receivers ride into the jit as constants."""

    def __init__(self, cfg: GCNConfig, u_normalizer=None, loss_type="l1",
                 use_sample_idx=True, template=None):
        self.cfg = cfg
        self.u_normalizer = u_normalizer
        self.loss_type = loss_type
        self.use_sample_idx = use_sample_idx
        self.template = template

    def forward(self, params, batch):
        if self.template is not None:
            tpl = self.template
            return jax.vmap(lambda x: gcn_apply(
                params, self.cfg, tpl.replace(x=x)))(batch.x)
        return jax.vmap(lambda g: gcn_apply(params, self.cfg, g))(batch)

    def mask(self, batch):
        return _node_mask_batched(batch)


class MGKNGeneralTask(_NormalizerDecodeMixin, Task):
    """Predictions/targets live on the finest level (no node padding)."""

    def __init__(self, cfg: MGKNGeneralConfig, u_normalizer=None,
                 loss_type="rel2", use_sample_idx=True):
        self.cfg = cfg
        self.u_normalizer = u_normalizer
        self.loss_type = loss_type
        self.use_sample_idx = use_sample_idx

    def forward(self, params, batch):
        return jax.vmap(
            lambda g: mgkn_general_apply(params, self.cfg, g))(batch)

    def mask(self, batch):
        b = batch.y.shape[0]
        return jnp.ones((b, self.cfg.points[0]), jnp.float32)


class MGKNOrthogonalTask(_NormalizerDecodeMixin, Task):
    def __init__(self, cfg: MGKNOrthogonalConfig, u_normalizer=None,
                 loss_type="rel2"):
        self.cfg = cfg
        self.u_normalizer = u_normalizer
        self.loss_type = loss_type
        self.use_sample_idx = False  # full-grid outputs

    def forward(self, params, batch):
        return jax.vmap(
            lambda g: mgkn_orthogonal_apply(params, self.cfg, g))(batch)

    def mask(self, batch):
        b = batch.x.shape[0]
        return jnp.ones((b, self.cfg.s), jnp.float32)


__all__ = ["GKNTask", "GCNTask", "MGKNGeneralTask", "MGKNOrthogonalTask"]
