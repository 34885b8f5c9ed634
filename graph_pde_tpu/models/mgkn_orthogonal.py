"""MGKN (orthogonal, 1-d) — nested multipole hierarchy on a dyadic grid.

Reference: multipole-graph-neural-operator/MGKN_orthogonal_burgers1d.py:
21-86. Levels share the same node set downsampled by 2; inter-level
transfer is nearest-neighbor upsampling / average pooling on the width
channels (reshape-based here, ops/pooling.py), and each level applies a
full edge-kernel conv on its FMM edge list (NN edges at the finest level,
"interactive" |dx| in {2,3} edges per level, graph/multipole.py).

V-cycle: store per-level states phi[l] on the way down; at the coarsest
level and on the way up apply residual convs with ReLU
(MGKN_orthogonal_burgers1d.py:59-86). Kernel widths halve per level with a
floor of 16 (line 35). Convs are PyG NNConv defaults: aggr='mean',
root_weight=True, bias=True.

Edge sets on the dyadic grid are deterministic in s, hence static-shape
without padding.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.dense import dense_init, linear_init, pyg_uniform_init
from ..ops.edge_conv import edge_kernel_conv
from ..ops.pooling import upsample_nearest_1d, avg_pool_1d


@struct.dataclass
class MultipoleGraph1D:
    """Per-sample data for the orthogonal MGKN.

    edge sets are ordered [NN(finest), inter(level 1), ..., inter(level L)]
    matching graph/multipole.py. senders/receivers are shared across the
    batch but stored per-sample for uniform vmap handling.
    """

    x: jnp.ndarray                      # [s, in_width]
    senders: List[jnp.ndarray]          # level+1 arrays
    receivers: List[jnp.ndarray]
    attrs: List[jnp.ndarray]            # [E_l, 4] each
    y: Optional[jnp.ndarray] = None     # [s, out]


@dataclasses.dataclass(frozen=True)
class MGKNOrthogonalConfig:
    width: int = 64
    ker_width: int = 1024
    depth: int = 4
    ker_in: int = 4
    in_width: int = 2
    out_width: int = 1
    s: int = 1024
    impl: str = "auto"
    compute_dtype: Optional[str] = None
    # kcached only: fp8 STE storage of the cached per-level kernel
    # matrices ('float8_e4m3'/'float8_e5m2'). The V-cycle depth loop is
    # unrolled Python, so each level's K is re-read depth times — the
    # fp8 buffer stays loop-resident exactly as in GKN (models/gkn.py,
    # ops/cached_contraction.quantize_ste).
    k_storage: Optional[str] = None

    @property
    def level(self) -> int:
        return int(np.log2(self.s) - 1)


def mgkn_orthogonal_init(key, cfg: MGKNOrthogonalConfig):
    level = cfg.level
    keys = jax.random.split(key, 3 * (level + 1) + 3)
    ki = iter(range(len(keys)))
    params = {
        "fc1": linear_init(keys[next(ki)], cfg.in_width, cfg.width),
        "conv": [],
    }
    for l in range(level + 1):
        kw_l = max(cfg.ker_width // (2 ** l), 16)
        params["conv"].append({
            "kernel": dense_init(keys[next(ki)],
                                 (cfg.ker_in, kw_l, kw_l, cfg.width ** 2)),
            "root": pyg_uniform_init(keys[next(ki)], cfg.width,
                                     (cfg.width, cfg.width)),
            "bias": pyg_uniform_init(keys[next(ki)], cfg.width,
                                     (cfg.width,)),
        })
    params["fc2"] = linear_init(keys[next(ki)], cfg.width, cfg.ker_width)
    params["fc3"] = linear_init(keys[next(ki)], cfg.ker_width,
                                cfg.out_width)
    return params


def _conv(x, g: MultipoleGraph1D, conv_params, cfg, idx: int, kk=None):
    if kk is not None:
        from ..ops.cached_contraction import apply_cached_kernel
        from ..ops.segment import gather_rows, masked_segment_mean

        e = g.senders[idx].shape[0]
        xj = gather_rows(x, g.senders[idx])
        msg = apply_cached_kernel(xj, kk, cfg.width, cfg.width)
        out = masked_segment_mean(msg, g.receivers[idx],
                                  jnp.ones((e,), bool), x.shape[0])
        return out + x @ conv_params["root"] + conv_params["bias"]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    e = g.senders[idx].shape[0]
    return edge_kernel_conv(
        x, g.senders[idx], g.receivers[idx], g.attrs[idx],
        jnp.ones((e,), bool), conv_params["kernel"],
        in_channels=cfg.width, out_channels=cfg.width, aggr="mean",
        root=conv_params["root"], bias=conv_params["bias"],
        impl=cfg.impl, compute_dtype=dtype)


def mgkn_orthogonal_apply(params, cfg: MGKNOrthogonalConfig,
                          g: MultipoleGraph1D) -> jnp.ndarray:
    level = cfg.level
    x = g.x @ params["fc1"]["w"] + params["fc1"]["b"]

    kks = None
    if cfg.impl == "kcached":
        # kappa is fixed across the depth V-cycles; evaluate each level's
        # kernel MLP once (see models/gkn.py kcached notes)
        from ..ops.dense import dense_apply
        from ..ops.cached_contraction import maybe_quantize_k

        k_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
        kks = []
        for idx in range(level + 1):
            a = g.attrs[idx]
            kp = params["conv"][idx]["kernel"]
            if cfg.compute_dtype == "bfloat16":
                # bf16 kappa MLP, f32 master params (models/gkn.py notes)
                kp = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16), kp)
                a = a.astype(jnp.bfloat16)
            kks.append(maybe_quantize_k(
                dense_apply(kp, a).astype(k_dtype), cfg.k_storage))

    def kk_of(idx):
        return kks[idx] if kks is not None else None

    for _ in range(cfg.depth):
        phi = [None] * level
        for l in range(level):
            phi[l] = x
            if l != level - 1:
                x = avg_pool_1d(x, 2)
        # coarsest: interactive edges of the deepest level
        x = jax.nn.relu(x + _conv(phi[-1], g, params["conv"][-1], cfg,
                                  level, kk=kk_of(level)))
        for l in reversed(range(level)):
            if l != 0:
                x = upsample_nearest_1d(x, 2)
                x = jax.nn.relu(
                    x + _conv(phi[l - 1], g, params["conv"][l], cfg, l,
                              kk=kk_of(l)))
            else:
                x = jax.nn.relu(
                    x + _conv(phi[0], g, params["conv"][0], cfg, 0,
                              kk=kk_of(0)))
    x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
    return x @ params["fc3"]["w"] + params["fc3"]["b"]


def mgkn_orthogonal_apply_batched(params, cfg, graphs):
    return jax.vmap(lambda g: mgkn_orthogonal_apply(params, cfg, g))(graphs)


__all__ = [
    "MultipoleGraph1D",
    "MGKNOrthogonalConfig",
    "mgkn_orthogonal_init",
    "mgkn_orthogonal_apply",
    "mgkn_orthogonal_apply_batched",
]
