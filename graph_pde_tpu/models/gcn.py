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
from ..ops.segment import (
    blocked_segment_mean, masked_segment_sum, segment_degrees, gather_rows,
)


def gcn_conv(x, senders, receivers, edge_mask, layer, n_node,
             inv_sqrt=None, inv_deg=None, node_block: int = 0):
    """One GCNConv: [N, in] -> [N, out].

    ``inv_sqrt``/``inv_deg`` are the (structural, conv-invariant)
    normalized-degree terms — pass them precomputed when applying many
    convs on one graph (gcn_apply computes them once per forward; the
    reference recomputes them inside every GCNConv call). With
    ``node_block`` set the aggregation takes the blocked-CSR one-hot
    path (bounded at any N — the full-421-grid lattice's layout)."""
    n = x.shape[0]
    if inv_sqrt is None:
        deg = segment_degrees(receivers, edge_mask, n) + 1.0  # +1 self loop
        inv_sqrt = jax.lax.rsqrt(deg)
        inv_deg = 1.0 / deg
    xw = x @ layer["w"]
    # mask out padded nodes' degree terms cleanly (deg>=1 always, no NaN)
    msg = gather_rows(xw, senders) * (inv_sqrt[senders] * edge_mask)[:, None]
    if node_block:
        agg = blocked_segment_mean(msg, receivers, edge_mask, n,
                                   node_block, aggr="sum")
    else:
        agg = masked_segment_sum(msg, receivers, edge_mask, n)
    out = inv_sqrt[:, None] * agg + inv_deg[:, None] * xw
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
    mask = graph.edge_mask().astype(x.dtype)
    n = int(graph.num_nodes_padded)
    nb = graph.node_block
    # normalized degrees are structural: compute ONCE per forward and
    # share across all depth*4 conv applications
    if nb:
        deg = blocked_segment_mean(mask[:, None], graph.receivers, mask,
                                   n, nb, aggr="sum")[:, 0] + 1.0
    else:
        deg = segment_degrees(graph.receivers, mask, n) + 1.0
    inv_sqrt = jax.lax.rsqrt(deg)
    inv_deg = 1.0 / deg
    for _ in range(cfg.depth):
        for conv in params["convs"]:
            x = jax.nn.relu(gcn_conv(x, graph.senders, graph.receivers,
                                     mask, conv, n, inv_sqrt=inv_sqrt,
                                     inv_deg=inv_deg, node_block=nb))
    x = jax.nn.relu(x @ params["fc_out1"]["w"] + params["fc_out1"]["b"])
    return x @ params["fc_out2"]["w"] + params["fc_out2"]["b"]


def gcn_apply_batched(params, cfg, graphs):
    return jax.vmap(lambda g: gcn_apply(params, cfg, g))(graphs)


__all__ = ["GCNConfig", "gcn_init", "gcn_apply", "gcn_apply_batched",
           "gcn_conv"]
