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
        # Derive each missing auxiliary field independently (a caller may
        # supply Kcoeff but not its gradients — e.g. a .mat with only
        # 'coeff'+'Kcoeff'); matches data/synthetic.py's derivations.
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


__all__ = ["GKNPredictor"]
