"""GCN baseline (neurips4_GCN.py:20-54).

4 distinct GCNConv layers iterated ``depth`` times + MLP head — the
reference's demonstration that plain GCNs fail at operator learning.

GCNConv follows PyG semantics: symmetric normalization with self-loops,
x' = D^-1/2 (A + I) D^-1/2 x W + b. Self-loops are added analytically
(one 1/deg_hat term) so padded edge lists need no extra self-edges.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.graph import Graph
from ..ops.dense import linear_init
from ..ops.segment import masked_segment_sum, segment_degrees, gather_rows


def gcn_conv(x, senders, receivers, edge_mask, layer, n_node):
    """One GCNConv: [N, in] -> [N, out]."""
    n = x.shape[0]
    xw = x @ layer["w"]
    deg = segment_degrees(receivers, edge_mask, n) + 1.0  # +1 self loop
    inv_sqrt = jax.lax.rsqrt(deg)
    # mask out padded nodes' degree terms cleanly (deg>=1 always, no NaN)
    msg = gather_rows(xw, senders) * (inv_sqrt[senders] * edge_mask)[:, None]
    agg = masked_segment_sum(msg, receivers, edge_mask, n)
    out = inv_sqrt[:, None] * agg + (1.0 / deg)[:, None] * xw
    return out + layer["b"]


@dataclasses.dataclass(frozen=True)
class GCNConfig:
    width: int = 128
    ker_width: int = 256
    depth: int = 1
    in_width: int = 6
    out_width: int = 1


def gcn_init(key, cfg: GCNConfig):
    keys = jax.random.split(key, 7)
    params = {
        "fc_in": linear_init(keys[0], cfg.in_width, cfg.width),
        "convs": [linear_init(keys[1 + i], cfg.width, cfg.width)
                  for i in range(4)],
        "fc_out1": linear_init(keys[5], cfg.width, cfg.ker_width),
        "fc_out2": linear_init(keys[6], cfg.ker_width, cfg.out_width),
    }
    return params


def gcn_apply(params, cfg: GCNConfig, graph: Graph) -> jnp.ndarray:
    x = graph.x @ params["fc_in"]["w"] + params["fc_in"]["b"]
    mask = graph.edge_mask()
    n = int(graph.num_nodes_padded)
    for _ in range(cfg.depth):
        for conv in params["convs"]:
            x = jax.nn.relu(gcn_conv(x, graph.senders, graph.receivers,
                                     mask, conv, n))
    x = jax.nn.relu(x @ params["fc_out1"]["w"] + params["fc_out1"]["b"])
    return x @ params["fc_out2"]["w"] + params["fc_out2"]["b"]


def gcn_apply_batched(params, cfg, graphs):
    return jax.vmap(lambda g: gcn_apply(params, cfg, g))(graphs)


__all__ = ["GCNConfig", "gcn_init", "gcn_apply", "gcn_apply_batched",
           "gcn_conv"]
