"""Dataset builders: PDE fields -> padded, stacked Graph batches.

Reproduces the reference experiment data pipelines as reusable functions:

- Darcy GKN (full-grid UAI1 / Nystrom-sampled neurips1_GKN,
  UAI3_resolution): GaussianNormalizer on coeff/Kcoeff/Kcoeff_x/Kcoeff_y,
  UnitGaussianNormalizer (or Gaussian for full-grid UAI1) on sol; node
  features [x, y, a, a_smooth, a_gradx, a_grady]; edge attrs
  [x_i, x_j, a_i, a_j] (6 features).
- Darcy MGKN (MGKN_general_darcy2d): multilevel Nystrom graphs.
- Burgers GKN (neurips5_GKN) and Burgers orthogonal MGKN
  (MGKN_orthogonal_burgers1d).

All builders are two-pass: build host-side edge lists, compute the max
edge count across samples, pad everything to one static capacity, stack
into a single leading-batch-axis pytree (the TPU replacement for PyG
DataLoader batching).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..graph.graph import (
    Graph, build_graph, stack_graphs, round_up, build_multilevel_graph,
)
from ..graph.mesh import (
    SquareMeshGenerator, RandomMeshGenerator, RandomMultiMeshGenerator,
)
from ..graph.multipole import multi_pole_grid1d, get_edge_attr
from ..utils.normalizers import GaussianNormalizer, UnitGaussianNormalizer


# ---------------------------------------------------------------- caching

def load_or_generate_darcy(n: int, s: int, seed: int = 0,
                           cache_dir: str = ".data_cache") -> Dict[str, np.ndarray]:
    """Synthetic Darcy fields with on-disk caching (generation at s=241
    costs ~0.5 s/sample; caching keeps bench startup fast)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"darcy_n{n}_s{s}_seed{seed}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    from .synthetic import darcy_dataset

    data = darcy_dataset(n, s, seed=seed)
    np.savez_compressed(path, **data)
    return data


def load_or_generate_burgers(n: int, s: int, seed: int = 0,
                             cache_dir: str = ".data_cache",
                             nu: float = 0.01) -> Dict[str, np.ndarray]:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"burgers_n{n}_s{s}_nu{nu}_seed{seed}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    from .synthetic import burgers_dataset

    data = burgers_dataset(n, s, seed=seed, nu=nu)
    np.savez_compressed(path, **data)
    return data


# ------------------------------------------------------- darcy field prep

@dataclasses.dataclass
class DarcyArrays:
    """Normalized flat per-sample fields [n, s*s] + the fitted normalizers."""
    a: np.ndarray
    a_smooth: np.ndarray
    a_gradx: np.ndarray
    a_grady: np.ndarray
    u: np.ndarray           # encoded
    u_normalizer: object
    s: int


def prepare_darcy(fields: Dict[str, np.ndarray], n: int, r: int = 1,
                  normalizers: Optional[dict] = None,
                  u_norm: str = "unit",
                  u_normalizer=None) -> Tuple[DarcyArrays, dict]:
    """Downsample by r, flatten, normalize. Returns arrays + the fitted
    input normalizers (pass them back in for test-set encoding)."""
    def ds(x):
        return x[:n, ::r, ::r].reshape(n, -1)

    a = ds(fields["coeff"])
    a_s = ds(fields["Kcoeff"])
    a_gx = ds(fields["Kcoeff_x"])
    a_gy = ds(fields["Kcoeff_y"])
    u = ds(fields["sol"])
    s = fields["coeff"][:, ::r, ::r].shape[1]

    if normalizers is None:
        normalizers = {
            "a": GaussianNormalizer(a),
            "a_smooth": GaussianNormalizer(a_s),
            "a_gradx": GaussianNormalizer(a_gx),
            "a_grady": GaussianNormalizer(a_gy),
        }
    a = np.asarray(normalizers["a"].encode(a))
    a_s = np.asarray(normalizers["a_smooth"].encode(a_s))
    a_gx = np.asarray(normalizers["a_gradx"].encode(a_gx))
    a_gy = np.asarray(normalizers["a_grady"].encode(a_gy))

    if u_normalizer is None:
        u_normalizer = (UnitGaussianNormalizer(u) if u_norm == "unit"
                        else GaussianNormalizer(u))
        u_enc = np.asarray(u_normalizer.encode(u))
    else:
        # test sets stay un-encoded in the reference; caller decides
        u_enc = u
    return (DarcyArrays(a, a_s, a_gx, a_gy, u_enc, u_normalizer, s),
            normalizers)


def _darcy_node_features(grid, arrays: DarcyArrays, j: int, idx):
    cols = [grid]
    for f in (arrays.a, arrays.a_smooth, arrays.a_gradx, arrays.a_grady):
        v = f[j] if idx is None else f[j][idx]
        cols.append(v.reshape(-1, 1))
    return np.concatenate(cols, axis=1)


def darcy_gkn_graphs(
    arrays: DarcyArrays,
    *,
    m: Optional[int] = None,
    k: int = 1,
    radius: float = 0.25,
    seed: int = 0,
    encode_y: bool = True,
    edge_multiple: int = 512,
    n_edge_pad: Optional[int] = None,
    node_block: int = 0,
) -> Graph:
    """Builds stacked GKN graphs. m=None -> full grid (UAI1 protocol,
    shared mesh across samples); m set -> Nystrom sampling with k graphs
    per sample (neurips1_GKN.py:118-134). node_block > 0 emits the
    blocked-CSR layout for MXU aggregation at large N."""
    s = arrays.s
    n = arrays.a.shape[0]
    raw = []
    if m is None:
        gen = SquareMeshGenerator([[0, 1], [0, 1]], [s, s])
        ei = gen.ball_connectivity(radius)
        grid = gen.get_grid()
        for j in range(n):
            attr = gen.attributes(theta=arrays.a[j])
            x = _darcy_node_features(grid, arrays, j, None)
            raw.append((x, ei, attr, arrays.u[j], np.arange(s * s)))
    else:
        gen = RandomMeshGenerator([[0, 1], [0, 1]], [s, s], sample_size=m,
                                  seed=seed)
        for j in range(n):
            for _ in range(k):
                idx = gen.sample()
                grid = gen.get_grid()
                ei = gen.ball_connectivity(radius)
                attr = gen.attributes(theta=arrays.a[j])
                x = _darcy_node_features(grid, arrays, j, idx)
                raw.append((x, ei, attr, arrays.u[j][idx], idx))

    e_max = max(r[1].shape[1] for r in raw)
    e_pad = n_edge_pad or round_up(e_max, edge_multiple)
    n_pad = round_up(raw[0][0].shape[0], 8)
    if node_block:
        # common per-block capacity across the batch
        bec = 0
        for (x, ei, attr, y, si) in raw:
            g = build_graph(x, ei[0], ei[1], attr, node_block=node_block,
                            edge_multiple=edge_multiple)
            bec = max(bec, g.senders.shape[0] // (g.x.shape[0] // node_block))
        graphs = [
            build_graph(x, ei[0], ei[1], attr, y=y, sample_idx=si,
                        n_node_pad=n_pad, node_block=node_block,
                        block_edge_cap=bec, edge_multiple=edge_multiple)
            for (x, ei, attr, y, si) in raw
        ]
        return stack_graphs(graphs)
    graphs = [
        build_graph(x, ei[0], ei[1], attr, y=y, sample_idx=si,
                    n_node_pad=n_pad, n_edge_pad=e_pad)
        for (x, ei, attr, y, si) in raw
    ]
    return stack_graphs(graphs)


def darcy_mgkn_graphs(
    arrays: DarcyArrays,
    *,
    points: Sequence[int],
    radius_inner: Sequence[float],
    radius_inter: Sequence[float],
    k: int = 1,
    seed: int = 0,
    edge_multiple: int = 256,
    caps: Optional[tuple] = None,
):
    """Builds stacked multilevel graphs (MGKN_general_darcy2d.py:226-257)."""
    s = arrays.s
    n = arrays.a.shape[0]
    level = len(points)
    gen = RandomMultiMeshGenerator([[0, 1], [0, 1]], [s, s], level=level,
                                   sample_sizes=list(points), seed=seed)
    raw = []
    for j in range(n):
        for _ in range(k):
            idx, idx_all = gen.sample()
            gen.ball_connectivity(radius_inner, radius_inter)
            attr, attr_down, attr_up = gen.attributes(theta=arrays.a[j])
            rng_mid, rng_down, rng_up = gen.get_edge_index_range()
            mid_attrs = [attr[rng_mid[l, 0]:rng_mid[l, 1]]
                         for l in range(level)]
            down_attrs = [attr_down[rng_down[l, 0]:rng_down[l, 1]]
                          for l in range(level - 1)]
            up_attrs = [attr_up[rng_up[l, 0]:rng_up[l, 1]]
                        for l in range(level - 1)]
            _, grid_all = gen.get_grid()
            x = np.concatenate([
                grid_all,
                arrays.a[j][idx_all][:, None],
                arrays.a_smooth[j][idx_all][:, None],
                arrays.a_gradx[j][idx_all][:, None],
                arrays.a_grady[j][idx_all][:, None],
            ], axis=1)
            y = arrays.u[j][idx[0]]
            raw.append((x, [e.copy() for e in gen.edge_index], mid_attrs,
                        [e.copy() for e in gen.edge_index_down], down_attrs,
                        [e.copy() for e in gen.edge_index_up], up_attrs,
                        y, idx[0]))

    # provided caps are MINIMUMS: random radius graphs have sample-dependent
    # edge counts, so another sample set (test/eval) may exceed caps fitted
    # to the training set; growing them recompiles but stays correct
    need_mid = tuple(
        round_up(max(r[1][l].shape[1] for r in raw), edge_multiple)
        for l in range(level))
    need_down = tuple(
        round_up(max(r[3][l].shape[1] for r in raw), edge_multiple)
        for l in range(level - 1))
    if caps is None:
        mid_caps, down_caps, up_caps = need_mid, need_down, need_down
    else:
        mid_caps = tuple(max(a, b) for a, b in zip(caps[0], need_mid))
        down_caps = tuple(max(a, b) for a, b in zip(caps[1], need_down))
        up_caps = tuple(max(a, b) for a, b in zip(caps[2], need_down))
    graphs = [
        build_multilevel_graph(
            x, points, mid_e, mid_a, down_e, down_a, up_e, up_a,
            y=y, sample_idx=si,
            mid_caps=mid_caps, down_caps=down_caps, up_caps=up_caps)
        for (x, mid_e, mid_a, down_e, down_a, up_e, up_a, y, si) in raw
    ]
    return stack_graphs(graphs), (mid_caps, down_caps, up_caps)


# ------------------------------------------------------------- burgers

@dataclasses.dataclass
class BurgersArrays:
    a: np.ndarray          # encoded [n, s]
    u: np.ndarray          # encoded [n, s]
    a_normalizer: object
    u_normalizer: object
    s: int


def prepare_burgers(fields: Dict[str, np.ndarray], n: int, r: int = 1,
                    a_normalizer=None, u_normalizer=None,
                    encode_u: bool = True) -> BurgersArrays:
    a = fields["a"][:n, ::r]
    u = fields["u"][:n, ::r]
    s = a.shape[1]
    if a_normalizer is None:
        a_normalizer = GaussianNormalizer(a)
    if u_normalizer is None:
        u_normalizer = UnitGaussianNormalizer(u)
    a = np.asarray(a_normalizer.encode(a))
    if encode_u:
        u = np.asarray(u_normalizer.encode(u))
    return BurgersArrays(a, u, a_normalizer, u_normalizer, s)


def burgers_gkn_graphs(
    arrays: BurgersArrays,
    *,
    m: int,
    k: int = 1,
    radius: float = 0.25,
    seed: int = 0,
    edge_multiple: int = 512,
    n_edge_pad: Optional[int] = None,
) -> Graph:
    """1-d Nystrom GKN graphs (neurips5_GKN.py:110-135): node features
    [x, a], edge attrs [x_i, x_j, a_i, a_j]."""
    s = arrays.s
    n = arrays.a.shape[0]
    gen = RandomMeshGenerator([[0, 1]], [s], sample_size=m, seed=seed)
    raw = []
    for j in range(n):
        for _ in range(k):
            idx = gen.sample()
            grid = gen.get_grid()
            ei = gen.ball_connectivity(radius)
            attr = gen.attributes(theta=arrays.a[j])
            x = np.concatenate([grid, arrays.a[j][idx][:, None]], axis=1)
            raw.append((x, ei, attr, arrays.u[j][idx], idx))
    e_max = max(r[1].shape[1] for r in raw)
    e_pad = n_edge_pad or round_up(e_max, edge_multiple)
    graphs = [
        build_graph(x, ei[0], ei[1], attr, y=y, sample_idx=si,
                    n_node_pad=round_up(m, 8), n_edge_pad=e_pad)
        for (x, ei, attr, y, si) in raw
    ]
    return stack_graphs(graphs)


def burgers_multipole_data(arrays: BurgersArrays, is_periodic: bool = True):
    """Per-batch data for the orthogonal MGKN
    (MGKN_orthogonal_burgers1d.py:146-183): level grids/thetas + static FMM
    edge lists + per-sample edge attrs.

    Returns (xs [n, s, 2], ys [n, s, 1], senders, receivers,
    attrs_per_level list of [n, E_l, 4]).
    """
    from ..models.mgkn_orthogonal import MultipoleGraph1D  # noqa: F401

    n, s = arrays.a.shape
    theta = arrays.a[:, :, None]
    grids, thetas, edges = multi_pole_grid1d(theta, 1, s, n,
                                             is_periodic=is_periodic)
    senders = [e[0].astype(np.int32) for e in edges]
    receivers = [e[1].astype(np.int32) for e in edges]
    attrs = []
    for i, e in enumerate(edges):
        li = max(i - 1, 0)
        attrs.append(np.stack([
            get_edge_attr(grids[li], thetas[li][j, :, 0], e)
            for j in range(n)
        ]))
    xs = np.stack([
        np.stack([grids[0], arrays.a[j]], axis=1) for j in range(n)
    ])
    ys = arrays.u[:, :, None]
    return xs.astype(np.float32), ys.astype(np.float32), senders, receivers, attrs


# ------------------------------------------------------------ iteration

def batch_iterator(stacked, batch_size: int, rng: Optional[np.random.Generator] = None,
                   drop_remainder: bool = True):
    """Yields stacked sub-batches from a leading-batch-axis pytree."""
    import jax

    leaves = jax.tree_util.tree_leaves(stacked)
    n = leaves[0].shape[0]
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, end, batch_size):
        sel = order[i: i + batch_size]
        yield jax.tree_util.tree_map(lambda a: a[sel], stacked)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Device-prefetching wrapper: keeps `size` batches in flight so
    host->device copies overlap the previous step's compute — the
    TPU-native replacement for the reference's synchronous per-step
    ``batch.to(device)`` (UAI1_full_resolution.py:259)."""
    import collections
    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(jax.device_put(batch, sharding))
        else:
            queue.append(jax.device_put(batch))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


__all__ = [
    "load_or_generate_darcy", "load_or_generate_burgers",
    "DarcyArrays", "prepare_darcy", "darcy_gkn_graphs", "darcy_mgkn_graphs",
    "BurgersArrays", "prepare_burgers", "burgers_gkn_graphs",
    "burgers_multipole_data",
    "batch_iterator", "prefetch_to_device",
]
