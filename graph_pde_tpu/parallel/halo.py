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
    from ..ops.edge_conv import _kernel_messages
    from ..ops.segment import masked_segment_mean, masked_segment_sum

    if impl in ("pallas", "pallas_interpret"):
        # fused kernel on the device-local edge bucket: the gather out
        # of the all-gathered features happens inside the kernel
        from ..ops.pallas_edge_conv import fused_edge_messages

        msg = fused_edge_messages(
            x_all, senders, edge_attr, kernel_params,
            in_channels=in_channels, out_channels=out_channels,
            interpret=(impl == "pallas_interpret"))
    else:
        msg = _kernel_messages(x_all[senders], edge_attr, kernel_params,
                               in_channels, out_channels, "full", None)
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
                           axis: str = "data", impl: str = "reference"):
    """GKN forward over one node-sharded graph.

    parts: output of partition_graph, device_put with leading axis sharded
    over `axis`. Returns [S * n_loc, out_width] gathered predictions.
    impl: 'reference' | 'pallas' (fused conv kernel inside shard_map) |
    'pallas_interpret' (same, interpret mode — exercises the fused-kernel
    + shard_map interaction on a CPU mesh).
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
                root=params.get("root"), bias=params.get("bias"),
                impl=impl)
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
        # pallas_call cannot annotate its outputs' varying-mesh-axes, so
        # the vma static check must be off for the fused impl
        check_vma=not impl.startswith("pallas"),
    )
    out = fn(parts["x"], parts["senders"], parts["receivers"],
             parts["edge_attr"], parts["edge_mask"])
    return out.reshape(-1, out.shape[-1])


def partition_graph_ring(graph: Graph, n_shards: int,
                         edge_multiple: int = 256):
    """Host-side: buckets each receiver-shard's edges by SENDER shard for
    ring execution. Returns arrays with leading axes [S_recv, S_send]:

      x: [S, n_loc, F]
      senders: [S, S, e_b]  local ids within the SENDING shard
      receivers: [S, S, e_b] local ids within the receiving shard
      edge_attr: [S, S, e_b, A]
      edge_mask: [S, S, e_b]
      node_mask: [S, n_loc]
    """
    parts = partition_graph(graph, n_shards, edge_multiple=1)
    S = n_shards
    n_loc = parts["x"].shape[1]
    a_dim = parts["edge_attr"].shape[-1]

    e_b = 1
    buckets = []
    for rs in range(S):
        senders = parts["senders"][rs]
        mask = parts["edge_mask"][rs]
        src_shard = senders // n_loc
        row = []
        for ss in range(S):
            sel = (src_shard == ss) & mask
            row.append(sel)
            e_b = max(e_b, int(sel.sum()))
        buckets.append(row)
    e_b = round_up(e_b, edge_multiple)

    out_s = np.zeros((S, S, e_b), np.int32)
    out_r = np.full((S, S, e_b), n_loc - 1, np.int32)
    out_a = np.zeros((S, S, e_b, a_dim), np.float32)
    out_m = np.zeros((S, S, e_b), bool)
    for rs in range(S):
        for ss in range(S):
            sel = buckets[rs][ss]
            e = int(sel.sum())
            out_s[rs, ss, :e] = parts["senders"][rs][sel] - ss * n_loc
            out_r[rs, ss, :e] = parts["receivers"][rs][sel]
            out_a[rs, ss, :e] = parts["edge_attr"][rs][sel]
            out_m[rs, ss, :e] = True
    return {
        "x": parts["x"],
        "senders": out_s,
        "receivers": out_r,
        "edge_attr": out_a,
        "edge_mask": out_m,
        "node_mask": parts["node_mask"],
    }


def ring_conv_local(x_loc, senders_by_src, receivers_by_src, attr_by_src,
                    mask_by_src, kernel_params, *, axis: str,
                    in_channels: int, out_channels: int,
                    aggr: str = "mean", root=None, bias=None):
    """Ring halo exchange (inside shard_map): instead of all-gathering the
    full node array, rotate [n_loc, w] feature blocks around the ring with
    ppermute; at step t each device holds shard (me - t) mod S and
    processes exactly the edge bucket whose senders live there. Peak
    memory is one block; communication overlaps the bucket compute."""
    from ..ops.edge_conv import _kernel_messages
    from ..ops.segment import segment_sum

    S = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    n_loc = x_loc.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def body(t, carry):
        block, acc, cnt = carry
        src = (me - t) % S
        s_b = jnp.take(senders_by_src, src, axis=0)
        r_b = jnp.take(receivers_by_src, src, axis=0)
        a_b = jnp.take(attr_by_src, src, axis=0)
        m_b = jnp.take(mask_by_src, src, axis=0)
        msg = _kernel_messages(block[s_b], a_b, kernel_params,
                               in_channels, out_channels, "full", None)
        m = m_b.astype(msg.dtype)
        acc = acc + segment_sum(msg * m[:, None], r_b, n_loc,
                                indices_are_sorted=False)
        cnt = cnt + segment_sum(m, r_b, n_loc, indices_are_sorted=False)
        block = jax.lax.ppermute(block, axis, perm)
        return block, acc, cnt

    # mark the accumulators as varying over the manual mesh axis so the
    # fori_loop carry type matches its (device-varying) outputs
    acc0 = jax.lax.pvary(jnp.zeros((n_loc, out_channels), jnp.float32),
                         axis)
    cnt0 = jax.lax.pvary(jnp.zeros((n_loc,), jnp.float32), axis)
    init = (x_loc, acc0, cnt0)
    _, acc, cnt = jax.lax.fori_loop(0, S, body, init)
    if aggr == "mean":
        out = acc / jnp.maximum(cnt, 1.0)[:, None]
    else:
        out = acc
    if root is not None:
        out = out + x_loc @ root
    if bias is not None:
        out = out + bias
    return out


def gkn_apply_node_sharded_ring(params, cfg, parts, mesh: Mesh,
                                axis: str = "data"):
    """GKN forward with ring-halo node sharding (parts from
    partition_graph_ring, leading axis sharded over `axis`)."""
    from jax import shard_map

    def body(x, senders, receivers, edge_attr, edge_mask):
        x = x[0]
        senders, receivers = senders[0], receivers[0]
        edge_attr, edge_mask = edge_attr[0], edge_mask[0]
        h = x @ params["fc1"]["w"] + params["fc1"]["b"]
        for t in range(cfg.depth):
            h = ring_conv_local(
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
    "partition_graph_ring",
    "node_sharded_conv_local",
    "ring_conv_local",
    "gkn_apply_node_sharded",
    "gkn_apply_node_sharded_ring",
]
