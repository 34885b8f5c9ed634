"""Inference/serving API.

The reference has no inference path beyond re-running script eval loops.
``GKNPredictor`` packages trained params + normalizers into a compiled
predictor that maps raw coefficient fields to decoded solution fields at
ANY grid resolution (the discretization-invariance property makes the
same weights valid across meshes):

- small grids: one full radius graph per sample, jit-compiled per
  (resolution, capacity) — compilations are cached and bounded because
  capacities are rounded up.
- large grids: split/assemble through RandomGridSplitter shards.

Built for batch serving: graphs are padded/stacked, the apply is a single
compiled vmap, and data is device-put once per call.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from .graph import (SquareMeshGenerator, RandomGridSplitter, build_graph,
                    stack_graphs, make_box_grid, round_up)
from .models.gkn import GKNConfig, gkn_apply


def derive_aux_fields(coeff, kcoeff, kx, ky, s):
    """Derive each missing auxiliary Darcy field independently (a caller
    may supply Kcoeff but not its gradients); matches data/synthetic.py's
    derivations (smooth = gaussian_filter(coeff, 1.0); grads = central
    differences of the smoothed field on the unit grid)."""
    if kcoeff is None:
        from scipy.ndimage import gaussian_filter as gf

        kcoeff = np.stack([gf(np.asarray(c).reshape(s, s), sigma=1.0)
                           for c in coeff])
    if kx is None or ky is None:
        h = 1.0 / (s - 1)
        grads = [np.gradient(np.asarray(k).reshape(s, s), h)
                 for k in kcoeff]
        if kx is None:
            kx = np.stack([g[0] for g in grads])
        if ky is None:
            ky = np.stack([g[1] for g in grads])
    return kcoeff, kx, ky


def _check_unit_norm_resolution(u_normalizer, s_nodes: int, family: str):
    """UnitGaussianNormalizer carries PER-NODE stats on the TRAINING
    grid; decoding another resolution with positional sample_idx would
    silently read the wrong rows."""
    u_stats = np.asarray(getattr(u_normalizer, "mean", 0.0))
    if u_stats.ndim >= 1 and u_stats.size > 1 and u_stats.size != s_nodes:
        raise ValueError(
            f"bundle's unit u-normalizer has per-node stats for "
            f"{u_stats.size} training-grid nodes but input has "
            f"{s_nodes} nodes; serve {family} at the training "
            f"resolution, or train/export with u_norm='gaussian' for "
            f"resolution-free serving")


@dataclasses.dataclass
class GKNPredictor:
    params: object
    cfg: GKNConfig
    input_normalizers: dict     # 'a', 'a_smooth', 'a_gradx', 'a_grady'
    u_normalizer: object
    radius: float = 0.2
    split_threshold: int = 10_000   # nodes above which to shard
    split_m: int = 400

    def __post_init__(self):
        import jax

        self._fwd = jax.jit(
            lambda p, g: jax.vmap(lambda gg: gkn_apply(p, self.cfg, gg))(g))
        self._mesh_cache: Dict[int, tuple] = {}

    # -------------------------------------------------------------- build

    def _node_features(self, grid, fields, j, idx=None):
        cols = [grid]
        for key in ("a", "a_smooth", "a_gradx", "a_grady"):
            v = fields[key][j] if idx is None else fields[key][j][idx]
            cols.append(np.asarray(v).reshape(-1, 1))
        return np.concatenate(cols, axis=1)

    def _encode_fields(self, coeff, kcoeff, kx, ky):
        n = coeff.shape[0]
        flat = lambda a: np.asarray(a).reshape(n, -1)
        return {
            "a": np.asarray(self.input_normalizers["a"].encode(flat(coeff))),
            "a_smooth": np.asarray(
                self.input_normalizers["a_smooth"].encode(flat(kcoeff))),
            "a_gradx": np.asarray(
                self.input_normalizers["a_gradx"].encode(flat(kx))),
            "a_grady": np.asarray(
                self.input_normalizers["a_grady"].encode(flat(ky))),
        }

    # ------------------------------------------------------------ predict

    def predict(self, coeff, kcoeff=None, kx=None, ky=None) -> np.ndarray:
        """coeff (+ optional smoothed/gradient fields): [n, s, s].
        Missing auxiliary fields are derived (gaussian smooth + gradients,
        matching data/synthetic.py). Returns decoded solutions [n, s*s]."""
        coeff = np.asarray(coeff)
        n, s = coeff.shape[0], coeff.shape[1]
        # UnitGaussianNormalizer carries PER-NODE stats on the TRAINING
        # grid; decoding another resolution with positional sample_idx
        # would silently read the wrong rows (node i of an s-grid is
        # not node i of the training grid). Gaussian (scalar) u-norms
        # serve any resolution.
        u_stats = np.asarray(getattr(self.u_normalizer, "mean", 0.0))
        if u_stats.ndim >= 1 and u_stats.size > 1 \
                and u_stats.size != s * s:
            raise ValueError(
                f"bundle's unit u-normalizer has per-node stats for "
                f"{u_stats.size} training-grid nodes but input is "
                f"s={s} ({s * s} nodes); serve at the training "
                f"resolution, or train/export with u_norm='gaussian' "
                f"for resolution-free serving")
        kcoeff, kx, ky = derive_aux_fields(coeff, kcoeff, kx, ky, s)
        fields = self._encode_fields(coeff, kcoeff, kx, ky)

        if s * s > self.split_threshold:
            return self._predict_split(fields, s)
        return self._predict_full(fields, s)

    def _predict_full(self, fields, s) -> np.ndarray:
        import jax

        n = fields["a"].shape[0]
        if s not in self._mesh_cache:
            gen = SquareMeshGenerator([[0, 1], [0, 1]], [s, s])
            ei = gen.ball_connectivity(self.radius)
            self._mesh_cache[s] = (gen.get_grid(), ei)
        grid, ei = self._mesh_cache[s]
        from .graph.build import edge_attributes

        graphs = []
        e_pad = round_up(ei.shape[1], 512)
        for j in range(n):
            attr = edge_attributes(grid, ei, theta=fields["a"][j])
            x = self._node_features(grid, fields, j)
            graphs.append(build_graph(
                x, ei[0], ei[1], attr, sample_idx=np.arange(s * s),
                n_edge_pad=e_pad))
        batch = jax.device_put(stack_graphs(graphs))
        out = np.asarray(self._fwd(self.params, batch))[:, :, 0]
        idx = np.asarray(batch.sample_idx)
        dec = self._decode(out, idx)
        return dec[:, : s * s]

    def _predict_split(self, fields, s) -> np.ndarray:
        import jax

        n = fields["a"].shape[0]
        n_nodes = s * s
        m = _largest_divisor_leq(n_nodes, self.split_m)
        grid = make_box_grid([[0, 1], [0, 1]], [s, s])
        sp = RandomGridSplitter(grid, s, d=2, m=m, l=1, radius=self.radius,
                                seed=0)
        out = np.zeros((n, n_nodes), np.float32)
        for j in range(n):
            theta = np.stack([fields["a"][j], fields["a_smooth"][j],
                              fields["a_gradx"][j],
                              fields["a_grady"][j]], axis=1)
            shards = sp.get_data(theta)
            batch = jax.device_put(stack_graphs(shards))
            pred = np.asarray(self._fwd(self.params, batch))[:, :, 0]
            idx = np.asarray(batch.sample_idx)
            dec = self._decode(pred, idx)
            preds = [dec[i][:m] for i in range(len(shards))]
            idxs = [idx[i][:m] for i in range(len(shards))]
            out[j] = sp.assemble(preds, idxs)
        return out

    def _decode(self, values, idx):
        try:
            return np.asarray(self.u_normalizer.decode(values,
                                                       sample_idx=idx))
        except (TypeError, IndexError):
            return np.asarray(self.u_normalizer.decode(values))


@dataclasses.dataclass
class MGKNGeneralPredictor:
    """Serves a general-MGKN bundle on raw Darcy coefficient fields via
    the reference's own full-field protocol: RandomMultiMeshSplitter
    windows covering every grid node, per-split multilevel forward,
    assembler stitch (MGKN_general_darcy2d.py:306-333). The multilevel
    graph always subsamples to cfg.points, so the splitter path is the
    native serving path at ANY grid size (there is no "small-grid"
    special case as in GKNPredictor)."""

    params: object
    cfg: object                      # MGKNGeneralConfig
    input_normalizers: dict          # 'a', 'a_smooth', 'a_gradx', 'a_grady'
    u_normalizer: object
    radius_inner: tuple
    radius_inter: tuple
    seed: int = 0

    def __post_init__(self):
        import jax

        from .models.mgkn_general import mgkn_general_apply

        self._fwd = jax.jit(
            lambda g: mgkn_general_apply(self.params, self.cfg, g))
        self._splitters = {}

    def predict(self, coeff, kcoeff=None, kx=None, ky=None) -> np.ndarray:
        """coeff (+ optional smoothed/gradient fields): [n, s, s].
        Returns decoded solutions [n, s*s]."""
        import jax
        from .graph import RandomMultiMeshSplitter

        coeff = np.asarray(coeff)
        n, s = coeff.shape[0], coeff.shape[1]
        _check_unit_norm_resolution(self.u_normalizer, s * s,
                                    "mgkn_general")
        kcoeff, kx, ky = derive_aux_fields(coeff, kcoeff, kx, ky, s)
        norms = self.input_normalizers
        flat = lambda a: np.asarray(a).reshape(n, -1)
        enc = {
            "a": np.asarray(norms["a"].encode(flat(coeff))),
            "a_smooth": np.asarray(norms["a_smooth"].encode(flat(kcoeff))),
            "a_gradx": np.asarray(norms["a_gradx"].encode(flat(kx))),
            "a_grady": np.asarray(norms["a_grady"].encode(flat(ky))),
        }
        if s not in self._splitters:
            self._splitters[s] = RandomMultiMeshSplitter(
                [[0, 1], [0, 1]], [s, s], level=len(self.cfg.points),
                sample_sizes=list(self.cfg.points), seed=self.seed)
        sp = self._splitters[s]
        out = np.zeros((n, s * s), np.float32)
        caps = None
        for j in range(n):
            theta_all = np.stack([enc["a"][j], enc["a_smooth"][j],
                                  enc["a_gradx"][j], enc["a_grady"][j]],
                                 axis=1)
            shards, caps = sp.splitter(
                list(self.radius_inner), list(self.radius_inter),
                enc["a"][j], theta_all, caps=caps)
            outs, idxs = [], []
            for g in shards:
                pred = np.asarray(self._fwd(jax.device_put(g)))[:, 0]
                idx = np.asarray(g.sample_idx)
                dec = self._decode_rows(pred, idx)
                outs.append(dec)
                idxs.append(idx)
            out[j] = sp.assembler(outs, idxs)
        return out

    def _decode_rows(self, values, idx):
        try:
            dec = self.u_normalizer.decode(values[None],
                                           sample_idx=idx[None])
        except (TypeError, IndexError):
            dec = self.u_normalizer.decode(values[None])
        return np.asarray(dec)[0]


@dataclasses.dataclass
class MGKNOrthogonalPredictor:
    """Serves an orthogonal-MGKN bundle on raw Burgers initial conditions
    a [n, s]. The dyadic level hierarchy is baked into the weights
    (level count = log2(s) - 1, one conv per level —
    MGKN_orthogonal_burgers1d.py:21-43), so serving is at the training
    resolution cfg.s."""

    params: object
    cfg: object                      # MGKNOrthogonalConfig
    a_normalizer: object
    u_normalizer: object

    def __post_init__(self):
        import jax

        from .models.mgkn_orthogonal import mgkn_orthogonal_apply

        self._fwd = jax.jit(jax.vmap(
            lambda g: mgkn_orthogonal_apply(self.params, self.cfg, g)))

    def predict(self, a) -> np.ndarray:
        """a: [n, s] initial conditions at the training resolution.
        Returns decoded solutions [n, s]."""
        import jax
        import jax.numpy as jnp
        from .data.datasets import BurgersArrays, burgers_multipole_data
        from .models.mgkn_orthogonal import MultipoleGraph1D

        a = np.asarray(a, np.float32)
        n, s = a.shape
        if s != self.cfg.s:
            raise ValueError(
                f"orthogonal MGKN serves at its training resolution "
                f"s={self.cfg.s} (the level hierarchy is baked into the "
                f"weights); got s={s}")
        enc = np.asarray(self.a_normalizer.encode(a))
        arrays = BurgersArrays(a=enc, u=np.zeros_like(enc),
                               a_normalizer=self.a_normalizer,
                               u_normalizer=self.u_normalizer, s=s)
        xs, _, senders, receivers, attrs = burgers_multipole_data(arrays)
        graphs = MultipoleGraph1D(
            x=jnp.asarray(xs),
            senders=[jnp.asarray(np.broadcast_to(se, (n,) + se.shape))
                     for se in senders],
            receivers=[jnp.asarray(np.broadcast_to(r, (n,) + r.shape))
                       for r in receivers],
            attrs=[jnp.asarray(at) for at in attrs],
            y=jnp.zeros((n, s, 1)))
        pred = np.asarray(self._fwd(jax.device_put(graphs)))[:, :, 0]
        return np.asarray(self.u_normalizer.decode(pred))


def _largest_divisor_leq(n: int, m: int) -> int:
    best = 1
    d = 1
    while d * d <= n:
        if n % d == 0:
            for c in (d, n // d):
                if c <= m:
                    best = max(best, c)
        d += 1
    return best


__all__ = ["GKNPredictor", "MGKNGeneralPredictor",
           "MGKNOrthogonalPredictor", "derive_aux_fields"]
