"""Reference-faithful torch building blocks (no PyG).

Each class/function reproduces the semantics of a reference component,
cited by file:line against /root/reference. This module is the
*independent implementation* side of the convergence A/B: it deliberately
re-derives the reference's math in plain torch rather than importing
anything from graph_pde_tpu, so agreement between the two trained models
is evidence about semantics, not shared code.

PyG dependency removal: for these models ``MessagePassing.propagate``
(flow source->target) is exactly

    x_j  = x.index_select(0, edge_index[0])
    msg  = message(x_j, edge_attr)
    aggr = scatter_mean(msg, edge_index[1], dim=0, size=N)
    out  = update(aggr, x)

which is what ``EdgeKernelConvMean`` below does with index_add_ and a
clamped bincount.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


# --------------------------------------------------------------- losses

class RelLpLoss:
    """LpLoss (p=2) of graph-neural-operator/utilities.py:156-199.

    ``rel``: per-sample relative L2 ||x - y|| / ||y|| on flattened
    fields, summed over the batch (size_average=False, the setting every
    reference script uses for its train/test metrics).
    """

    def __init__(self, size_average: bool = False):
        self.size_average = size_average

    def rel(self, x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
        b = x.shape[0]
        d = torch.norm(x.reshape(b, -1) - y.reshape(b, -1), 2, dim=1)
        n = torch.norm(y.reshape(b, -1), 2, dim=1)
        r = d / n
        return r.mean() if self.size_average else r.sum()

    __call__ = rel


# ---------------------------------------------------------- normalizers

class ScalarGaussianNormalizer:
    """GaussianNormalizer of graph-neural-operator/utilities.py:109-131:
    global scalar mean/std (torch.std => Bessel-corrected), eps added to
    std in BOTH encode and decode."""

    def __init__(self, x: torch.Tensor, eps: float = 1e-5):
        self.mean = torch.mean(x)
        self.std = torch.std(x)
        self.eps = eps

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x, sample_idx=None):
        return x * (self.std + self.eps) + self.mean


class PointwiseGaussianNormalizer:
    """UnitGaussianNormalizer of multipole .../utilities.py:72-107:
    per-grid-node mean/std over the train set; decode supports a
    sample_idx gather for Nystrom-subsampled outputs."""

    def __init__(self, x: torch.Tensor, eps: float = 1e-5):
        self.mean = torch.mean(x, 0)
        self.std = torch.std(x, 0)
        self.eps = eps

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x, sample_idx=None):
        if sample_idx is None:
            std, mean = self.std + self.eps, self.mean
        else:
            std = self.std[sample_idx] + self.eps
            mean = self.mean[sample_idx]
        return x * std + mean


# ------------------------------------------------------------ kernel MLP

class KernelMLP(torch.nn.Module):
    """DenseNet of multipole .../utilities.py:205-231: plain Linear
    stack with ReLU between layers (none on the output), default torch
    Linear init (reset(nn) re-runs exactly that, nn_conv.py:261)."""

    def __init__(self, layers):
        super().__init__()
        self.linears = torch.nn.ModuleList(
            [torch.nn.Linear(a, b) for a, b in zip(layers[:-1], layers[1:])])

    def forward(self, x):
        for i, lin in enumerate(self.linears):
            x = lin(x)
            if i + 1 < len(self.linears):
                x = F.relu(x)
        return x


# ------------------------------------------------------------- edge conv

class EdgeKernelConvMean(torch.nn.Module):
    """NNConv_old of graph-neural-operator/nn_conv.py:197-288 with
    aggr='mean' (also PyG NNConv with default flags, which the MGKN
    scripts use — same message/update/init structure).

    message: W_e = kernel(edge_attr).view(E, in, out); x_j @ W_e
             (nn_conv.py:273-275)
    aggregate: scatter-mean onto edge_index[1] (PyG 'mean')
    update: + x @ root + bias (nn_conv.py:277-282)
    init: kernel MLP default Linear init via reset();
          root/bias ~ U(-1/sqrt(in), 1/sqrt(in)) (PyG uniform(size),
          nn_conv.py:261-265)
    """

    def __init__(self, channels: int, kernel: torch.nn.Module,
                 root_weight: bool = True, bias: bool = True):
        super().__init__()
        self.channels = channels
        self.kernel = kernel
        bound = 1.0 / math.sqrt(channels)
        if root_weight:
            self.root = torch.nn.Parameter(
                torch.empty(channels, channels).uniform_(-bound, bound))
        else:
            self.root = None
        if bias:
            self.bias = torch.nn.Parameter(
                torch.empty(channels).uniform_(-bound, bound))
        else:
            self.bias = None

    def forward(self, x, edge_index, edge_attr):
        src, dst = edge_index[0], edge_index[1]
        w_e = self.kernel(edge_attr).view(-1, self.channels, self.channels)
        x_j = x.index_select(0, src)
        msg = torch.matmul(x_j.unsqueeze(1), w_e).squeeze(1)
        agg = torch.zeros_like(x).index_add_(0, dst, msg)
        counts = torch.bincount(dst, minlength=x.shape[0]).clamp_(min=1)
        out = agg / counts.unsqueeze(1).to(agg.dtype)
        if self.root is not None:
            out = out + x @ self.root
        if self.bias is not None:
            out = out + self.bias
        return out


class GKN3(torch.nn.Module):
    """KernelNN3 of graph-neural-operator/UAI3_resolution.py:13-32:
    Linear encoder; ONE shared mean-aggregation edge conv applied depth
    times with ReLU after every application (including the last); Linear
    decoder. Kernel MLP layers [ker_in, ker_width//2, ker_width, w^2]."""

    def __init__(self, width: int, ker_width: int, depth: int,
                 ker_in: int, in_width: int):
        super().__init__()
        self.depth = depth
        self.encode = torch.nn.Linear(in_width, width)
        kernel = KernelMLP([ker_in, ker_width // 2, ker_width, width ** 2])
        self.conv = EdgeKernelConvMean(width, kernel)
        self.decode = torch.nn.Linear(width, 1)

    def forward(self, x, edge_index, edge_attr):
        h = self.encode(x)
        for _ in range(self.depth):
            h = F.relu(self.conv(h, edge_index, edge_attr))
        return self.decode(h)


# ----------------------------------------------------- graph construction

class NystromRadiusMesh:
    """RandomMeshGenerator of graph-neural-operator/utilities.py:328-398
    on a 2-D box grid: torch.randperm Nystrom subsample of the s*s grid,
    dense pairwise radius graph (pwd <= r keeps distance-0 self-loops),
    edge attributes [x_i, x_j, theta_i, theta_j] (attributes with
    f=None, theta=full flattened field; theta indexed by the subsample
    then by edge endpoints, utilities.py:372-383).

    The grid matches np.meshgrid default 'xy' ordering + ravel
    (utilities.py:345-347): node i = (xs[i % s], ys[i // s]), pairing
    flattened-field element i (row i//s = y, col i%s = x).
    """

    def __init__(self, s: int, m: int, generator: torch.Generator):
        xs = np.linspace(0.0, 1.0, s)
        gx, gy = np.meshgrid(xs, xs)
        self.grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
        self.n = s * s
        self.m = min(m, self.n)
        self.gen = generator

    def sample(self):
        idx = torch.randperm(self.n, generator=self.gen)[: self.m]
        self.idx = idx.numpy()
        self.points = self.grid[self.idx]
        return idx

    def radius_edges(self, r: float) -> np.ndarray:
        diff = self.points[:, None, :] - self.points[None, :, :]
        pwd = np.sqrt((diff ** 2).sum(-1))
        self.edge_index = np.stack(np.nonzero(pwd <= r))
        return self.edge_index

    def edge_attributes(self, theta_flat: np.ndarray) -> np.ndarray:
        ei = self.edge_index
        th = np.asarray(theta_flat)[self.idx]
        return np.concatenate(
            [self.points[ei[0]], self.points[ei[1]],
             th[ei[0]][:, None], th[ei[1]][:, None]], axis=1)

    def node_features(self, fields_flat) -> np.ndarray:
        """[grid_xy | field_0[idx] | field_1[idx] | ...] as in
        UAI3_resolution.py:141-146."""
        cols = [self.points]
        cols += [np.asarray(f)[self.idx][:, None] for f in fields_flat]
        return np.concatenate(cols, axis=1)


def fmm_grid_1d(s: int, periodic: bool = True):
    """multi_pole_grid1d of multipole .../utilities.py:1702-1769
    (geometry only; per-sample theta handled by the caller): level-l grid
    is the stride-2^(l-1) subsample of [0,1]; the finest level gets
    nearest-neighbour (|delta|=1) edges; every level gets 'interactive'
    edges (2 <= |delta| <= 3 whose parents are nearest neighbours).
    Returns (grids, edge_lists): len(grids) = log2(s)-1 levels;
    edge_lists[0] = finest NN edges, edge_lists[i>=1] = interactive edges
    of level i-1.
    """
    levels = int(np.log2(s) - 1)
    grids, edge_lists = [], []
    for lev in range(levels):
        s_l = s >> lev
        grids.append(np.linspace(0.0, 1.0, s_l))
        if lev == 0:
            nn = []
            for i in range(s_l):
                for d in (-1, 1):
                    j = (i + d) % s_l if periodic else i + d
                    if 0 <= j < s_l:
                        nn.append((i, j))
            edge_lists.append(np.asarray(nn, dtype=np.int64).T)
        inter = []
        for i in range(s_l):
            for d in range(-3, 4):
                j = (i + d) % s_l if periodic else i + d
                if not (0 <= j < s_l) or abs(d) < 2:
                    continue
                if abs(i // 2 - j // 2) % (s_l // 2) <= 1:
                    inter.append((i, j))
        edge_lists.append(np.asarray(inter, dtype=np.int64).T)
    return grids, edge_lists


def edge_attr_1d(grid: np.ndarray, theta: np.ndarray,
                 edge_index: np.ndarray) -> np.ndarray:
    """get_edge_attr of multipole .../utilities.py:1771-1777:
    [x_i, x_j, theta_i, theta_j] for 1-D nodes."""
    ei = edge_index
    return np.stack([grid[ei[0]], grid[ei[1]],
                     theta[ei[0]], theta[ei[1]]], axis=1)


class MGKNOrthogonal1D(torch.nn.Module):
    """MGKN of multipole .../MGKN_orthogonal_burgers1d.py:21-86: levels
    share one node set downsampled by 2 (avg_pool1d down, nearest
    upsample up); per-level mean-aggregation NNConv over the FMM edge
    lists; V-cycle keeps per-level residual states phi[l]; kappa width
    floors at 16; decoder fc2-relu-fc3."""

    def __init__(self, width: int, ker_width: int, depth: int,
                 ker_in: int, in_width: int, s: int):
        super().__init__()
        self.depth, self.width, self.s = depth, width, s
        self.levels = int(np.log2(s) - 1)
        self.encode = torch.nn.Linear(in_width, width)
        convs = []
        for lev in range(self.levels + 1):
            kw = max(ker_width >> lev, 16)
            convs.append(EdgeKernelConvMean(
                width, KernelMLP([ker_in, kw, kw, width ** 2])))
        self.convs = torch.nn.ModuleList(convs)
        self.fc2 = torch.nn.Linear(width, ker_width)
        self.fc3 = torch.nn.Linear(ker_width, 1)

    @staticmethod
    def _pool2(x):        # [n, w] -> [n/2, w] via avg_pool1d (ref :53-57)
        return F.avg_pool1d(x.t().unsqueeze(0), 2)[0].t()

    @staticmethod
    def _up2(x):          # [n, w] -> [2n, w] nearest (ref :46-50)
        return F.interpolate(x.t().unsqueeze(0), scale_factor=2,
                             mode="nearest")[0].t()

    def forward(self, x_nodes, edge_lists, attr_lists):
        x = self.encode(x_nodes)
        phi = [None] * self.levels
        for _ in range(self.depth):
            for lev in range(self.levels):
                phi[lev] = x
                if lev != self.levels - 1:
                    x = self._pool2(x)
            x = F.relu(x + self.convs[-1](
                phi[-1], edge_lists[-1], attr_lists[-1]))
            for lev in reversed(range(self.levels)):
                if lev != 0:
                    x = self._up2(x)
                    x = F.relu(x + self.convs[lev](
                        phi[lev - 1], edge_lists[lev], attr_lists[lev]))
                else:
                    x = F.relu(x + self.convs[0](
                        phi[0], edge_lists[0], attr_lists[0]))
        return self.fc3(F.relu(self.fc2(x)))
