"""Node-sharded single-graph execution (the graph analog of sequence
parallelism).

The reference scales past device memory with host-side splitters
(SURVEY.md section 5, "long-context analog"). The TPU-native path shards
the *nodes of one graph* across devices instead: each device owns a
contiguous node block and every edge whose RECEIVER lives in its block
(receiver-sorted edge lists make this a cheap host-side partition). Each
conv iteration all-gathers the [N, width] node features over ICI — small
next to the per-edge kernel-MLP FLOPs — then computes its edge block's
messages and reduces them locally. Gradients flow through the all-gather
(reduce-scatter in the backward pass), all inserted by shard_map/psum
machinery.

A ring-halo (ppermute) variant that exchanges only boundary features is a
further optimization once profiles show the all-gather matters.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.graph import Graph, round_up
from ..ops.edge_conv import edge_kernel_conv


def partition_graph(graph: Graph, n_shards: int, edge_multiple: int = 256):
    """Host-side: splits a padded Graph into per-device node blocks.

    Returns a dict of numpy arrays with leading axis n_shards:
      x: [S, n_loc, F]
      senders: [S, e_loc] GLOBAL node ids (index into all-gathered x)
      receivers: [S, e_loc] LOCAL node ids within the shard
      edge_attr: [S, e_loc, A]
      edge_mask: [S, e_loc]
      node_mask: [S, n_loc]
    """
    x = np.asarray(graph.x)
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    attr = np.asarray(graph.edge_attr)
    emask = np.asarray(graph.edge_mask())
    nmask = np.asarray(graph.node_mask())

    n_pad = x.shape[0]
    n_loc = round_up(-(-n_pad // n_shards), 8)
    n_tot = n_loc * n_shards
    if n_tot != n_pad:
        x = np.pad(x, ((0, n_tot - n_pad), (0, 0)))
        nmask = np.pad(nmask, (0, n_tot - n_pad))

    shard_of = receivers // n_loc
    e_loc = 0
    per_shard = []
    for s in range(n_shards):
        sel = (shard_of == s) & emask
        per_shard.append(sel)
        e_loc = max(e_loc, int(sel.sum()))
    e_loc = round_up(max(e_loc, 1), edge_multiple)

    S = n_shards
    out_s = np.zeros((S, e_loc), np.int32)
    out_r = np.full((S, e_loc), n_loc - 1, np.int32)
    out_a = np.zeros((S, e_loc, attr.shape[1]), np.float32)
    out_m = np.zeros((S, e_loc), bool)
    for s in range(S):
        sel = per_shard[s]
        e = int(sel.sum())
        out_s[s, :e] = senders[sel]
        out_r[s, :e] = receivers[sel] - s * n_loc
        out_a[s, :e] = attr[sel]
        out_m[s, :e] = True
    return {
        "x": x.reshape(S, n_loc, -1),
        "senders": out_s,
        "receivers": out_r,
        "edge_attr": out_a,
        "edge_mask": out_m,
        "node_mask": nmask.reshape(S, n_loc),
    }


def node_sharded_conv_local(x_loc, senders, receivers, edge_attr, edge_mask,
                            kernel_params, *, axis: str, in_channels: int,
                            out_channels: int, aggr: str = "mean",
                            root=None, bias=None, impl: str = "reference"):
    """Per-device body (call inside shard_map): all-gather node features
    over `axis`, compute the local edge block, reduce onto local nodes."""
    x_all = jax.lax.all_gather(x_loc, axis, axis=0, tiled=True)  # [N, F]
    n_loc = x_loc.shape[0]
    x_src = x_all[senders]
    from ..ops.edge_conv import _kernel_messages
    from ..ops.segment import masked_segment_mean, masked_segment_sum

    msg = _kernel_messages(x_src, edge_attr, kernel_params, in_channels,
                           out_channels, "full", None)
    if aggr == "mean":
        out = masked_segment_mean(msg, receivers, edge_mask, n_loc)
    else:
        out = masked_segment_sum(msg, receivers, edge_mask, n_loc)
    if root is not None:
        out = out + x_loc @ root
    if bias is not None:
        out = out + bias
    return out


def gkn_apply_node_sharded(params, cfg, parts, mesh: Mesh,
                           axis: str = "data"):
    """GKN forward over one node-sharded graph.

    parts: output of partition_graph, device_put with leading axis sharded
    over `axis`. Returns [S * n_loc, out_width] gathered predictions.
    """
    from jax import shard_map

    def body(x, senders, receivers, edge_attr, edge_mask):
        x = x[0]
        senders, receivers = senders[0], receivers[0]
        edge_attr, edge_mask = edge_attr[0], edge_mask[0]
        h = x @ params["fc1"]["w"] + params["fc1"]["b"]
        for t in range(cfg.depth):
            h = node_sharded_conv_local(
                h, senders, receivers, edge_attr, edge_mask,
                params["kernel"], axis=axis, in_channels=cfg.width,
                out_channels=cfg.width, aggr=cfg.aggr,
                root=params.get("root"), bias=params.get("bias"))
            if t != cfg.depth - 1 or cfg.relu_last:
                h = jax.nn.relu(h)
        if cfg.decoder_mlp:
            h = jax.nn.relu(h @ params["fc2"]["w"] + params["fc2"]["b"])
            h = h @ params["fc3"]["w"] + params["fc3"]["b"]
        else:
            h = h @ params["fc2"]["w"] + params["fc2"]["b"]
        return h[None]

    spec = P(axis)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=spec,
    )
    out = fn(parts["x"], parts["senders"], parts["receivers"],
             parts["edge_attr"], parts["edge_mask"])
    return out.reshape(-1, out.shape[-1])


__all__ = [
    "partition_graph",
    "node_sharded_conv_local",
    "gkn_apply_node_sharded",
]
