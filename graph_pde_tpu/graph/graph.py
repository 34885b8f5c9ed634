"""Static-shape graph containers.

TPU-first design: XLA traces once per shape, so graphs are padded to
static capacities. A ``Graph`` holds node features, an edge list sorted by
receiver (so segment reductions can use ``indices_are_sorted``), and valid
counts; padding edges sit at the tail with ``receiver = N_pad - 1`` and
are excluded from aggregation by the edge mask.

This replaces the reference's variable-shape PyG ``Data`` objects
(e.g. graph-neural-operator/UAI1_full_resolution.py:150-159). Batching is
a leading batch axis (stack of same-capacity graphs) rather than PyG's
disjoint-union, which maps directly onto vmap/pjit data parallelism.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@struct.dataclass
class Graph:
    """A padded, receiver-sorted edge-list graph.

    Attributes:
      x: [N_pad, F] node features.
      senders: [E_pad] int32 source node of each edge (message source).
      receivers: [E_pad] int32 target node (sorted ascending; padding tail
        points at N_pad - 1).
      edge_attr: [E_pad, A] edge features.
      n_node: [] int32 number of valid nodes (valid nodes are a prefix).
      n_edge: [] int32 number of valid edges (valid edges are a prefix).
      y: optional [N_pad, out] node targets.
      sample_idx: optional [N_pad] int32 original-grid index of each node
        (for normalizer decode / assembly).
    """

    x: jnp.ndarray
    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_attr: jnp.ndarray
    n_node: jnp.ndarray
    n_edge: jnp.ndarray
    y: Optional[jnp.ndarray] = None
    sample_idx: Optional[jnp.ndarray] = None

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[-2]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[-1]

    def node_mask(self):
        return jnp.arange(self.num_nodes_padded) < self.n_node

    def edge_mask(self):
        return jnp.arange(self.num_edges_padded) < self.n_edge


def build_graph(
    x: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_attr: np.ndarray,
    *,
    n_node_pad: Optional[int] = None,
    n_edge_pad: Optional[int] = None,
    node_multiple: int = 8,
    edge_multiple: int = 512,
    y: Optional[np.ndarray] = None,
    sample_idx: Optional[np.ndarray] = None,
) -> Graph:
    """Pads and sorts host-side numpy arrays into a ``Graph``.

    Edges are sorted by (receiver, sender). Capacities default to the
    actual sizes rounded up to ``node_multiple`` / ``edge_multiple`` to
    bound XLA recompilation across samples.
    """
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    senders = np.asarray(senders, np.int32).reshape(-1)
    receivers = np.asarray(receivers, np.int32).reshape(-1)
    edge_attr = np.asarray(edge_attr, np.float32)
    if edge_attr.ndim == 1:
        edge_attr = edge_attr[:, None]

    n, f = x.shape
    e, a = edge_attr.shape
    assert senders.shape == (e,) and receivers.shape == (e,)

    order = np.lexsort((senders, receivers))
    senders = senders[order]
    receivers = receivers[order]
    edge_attr = edge_attr[order]

    n_pad = n_node_pad if n_node_pad is not None else round_up(max(n, 1), node_multiple)
    e_pad = n_edge_pad if n_edge_pad is not None else round_up(max(e, 1), edge_multiple)
    assert n_pad >= n, f"node capacity {n_pad} < {n}"
    assert e_pad >= e, f"edge capacity {e_pad} < {e}"

    xp = np.zeros((n_pad, f), np.float32)
    xp[:n] = x
    sp = np.zeros((e_pad,), np.int32)
    sp[:e] = senders
    rp = np.full((e_pad,), n_pad - 1, np.int32)
    rp[:e] = receivers
    ap = np.zeros((e_pad, a), np.float32)
    ap[:e] = edge_attr

    yp = None
    if y is not None:
        y = np.asarray(y, np.float32)
        if y.ndim == 1:
            y = y[:, None]
        yp = np.zeros((n_pad, y.shape[1]), np.float32)
        yp[: y.shape[0]] = y

    sip = None
    if sample_idx is not None:
        sample_idx = np.asarray(sample_idx, np.int32).reshape(-1)
        sip = np.zeros((n_pad,), np.int32)
        sip[: sample_idx.shape[0]] = sample_idx

    return Graph(
        x=xp,
        senders=sp,
        receivers=rp,
        edge_attr=ap,
        n_node=np.int32(n),
        n_edge=np.int32(e),
        y=yp,
        sample_idx=sip,
    )


def stack_graphs(graphs) -> Graph:
    """Stacks same-capacity graphs along a new leading batch axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *graphs)


def pad_capacities(graphs) -> tuple:
    """Max (node, edge) capacity over a list of pre-pad (n, e) tuples."""
    n_max = max(g[0] for g in graphs)
    e_max = max(g[1] for g in graphs)
    return n_max, e_max


__all__ = ["Graph", "build_graph", "stack_graphs", "round_up"]
