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


def _sorted_span_flag(receivers_padded: np.ndarray, limit: int = 64) -> int:
    """Host-side verification of the block-local one-hot span bound
    (ops/segment.py sorted_block_segment_reduce): returns ``limit`` when
    every _SORTED_BLOCK_EB-edge block of the (sorted, padded) receiver
    array spans < ``limit`` distinct-node range, else 0 (keep scatter)."""
    from ..ops.segment import _SORTED_BLOCK_EB as eb

    e = receivers_padded.shape[0]
    if e == 0 or e % eb != 0:
        return 0
    rb = receivers_padded.reshape(-1, eb)
    span = int((rb[:, -1] - rb[:, 0]).max()) + 1
    return limit if span <= limit else 0


def _sender_sort(senders_padded: np.ndarray):
    """Sender-sort permutation + verified span for the scatter-free
    conv backward (Graph.sender_perm/sender_span); (None, 0) when the
    span bound fails (e.g. hub nodes interleaved with 0-degree runs)."""
    perm = np.argsort(senders_padded, kind="stable").astype(np.int32)
    span = _sorted_span_flag(senders_padded[perm])
    return (perm, span) if span else (None, 0)


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
    # blocked-CSR layout (node_block > 0): edges are grouped per node
    # block (receiver-sorted runs padded to a common per-block capacity),
    # enabling MXU one-hot aggregation at any N. edge_valid is the
    # explicit mask (validity is no longer a prefix).
    edge_valid: Optional[jnp.ndarray] = None
    node_block: int = struct.field(pytree_node=False, default=0)
    # Flat receiver-sorted layout only: host-verified bound for the
    # block-local one-hot segment reduction (ops/segment.py
    # sorted_block_segment_reduce) — within every _SORTED_BLOCK_EB-edge
    # block, max(receiver) - min(receiver) < sorted_span. 0 = bound not
    # verified (low-degree graphs can exceed it); the op then keeps the
    # scatter fallback. Static aux: set at build, recomputed on repad,
    # harmonized (min) across a stack.
    sorted_span: int = struct.field(pytree_node=False, default=0)
    # Scatter-free conv backward (ops/segment.py gather_rows_st):
    # sender_perm sorts the padded edge array by sender; sender_span is
    # the host-verified block span bound of that sorted stream. The
    # gather x[senders]'s transpose then routes through the block-local
    # one-hot reduce instead of XLA's serialized scatter-add (isolated
    # 35.9 -> 20.0 ms at E=1.2M; ~3 ms/conv in situ — PERF_NOTES
    # round 3). None/0 = fall back to the scatter.
    sender_perm: Optional[jnp.ndarray] = None
    sender_span: int = struct.field(pytree_node=False, default=0)

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[-2]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[-1]

    def node_mask(self):
        return jnp.arange(self.num_nodes_padded) < self.n_node

    def edge_mask(self):
        if self.edge_valid is not None:
            return self.edge_valid
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
    node_block: int = 0,
    block_edge_cap: Optional[int] = None,
) -> Graph:
    """Pads and sorts host-side numpy arrays into a ``Graph``.

    Edges are sorted by (receiver, sender). Capacities default to the
    actual sizes rounded up to ``node_multiple`` / ``edge_multiple`` to
    bound XLA recompilation across samples.

    With ``node_block`` set, emits the blocked-CSR layout: nodes are
    grouped into blocks of that size and each block's (contiguous,
    receiver-sorted) edge run is padded to a common per-block capacity —
    the layout the MXU one-hot aggregation path needs at large N
    (ops/segment.py blocked path).
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

    if node_block:
        n_pad = round_up(n_node_pad or n, node_block)
    else:
        n_pad = (n_node_pad if n_node_pad is not None
                 else round_up(max(n, 1), node_multiple))
    assert n_pad >= n, f"node capacity {n_pad} < {n}"

    ev = None
    if node_block:
        n_blocks = n_pad // node_block
        starts = np.searchsorted(receivers,
                                 np.arange(n_blocks) * node_block)
        ends = np.append(starts[1:], e)
        per_block = ends - starts
        eb = block_edge_cap or round_up(int(per_block.max()),
                                        edge_multiple)
        assert eb >= per_block.max(), \
            f"block edge capacity {eb} < {per_block.max()}"
        e_pad = n_blocks * eb
        sp = np.zeros((e_pad,), np.int32)
        rp = np.zeros((e_pad,), np.int32)
        ap = np.zeros((e_pad, a), np.float32)
        ev = np.zeros((e_pad,), bool)
        for b in range(n_blocks):
            cnt = per_block[b]
            o = b * eb
            sp[o:o + cnt] = senders[starts[b]:ends[b]]
            rp[o:o + cnt] = receivers[starts[b]:ends[b]]
            # padding inside block b parks on the block's last node
            rp[o + cnt:o + eb] = (b + 1) * node_block - 1
            ap[o:o + cnt] = edge_attr[starts[b]:ends[b]]
            ev[o:o + cnt] = True
        xp = np.zeros((n_pad, f), np.float32)
        xp[:n] = x
        yp = _pad_y(y, n_pad)
        sip = _pad_sample_idx(sample_idx, n_pad)
        sperm, sspan = _sender_sort(sp)
        return Graph(x=xp, senders=sp, receivers=rp, edge_attr=ap,
                     n_node=np.int32(n), n_edge=np.int32(e), y=yp,
                     sample_idx=sip, edge_valid=ev, node_block=node_block,
                     sender_perm=sperm, sender_span=sspan)

    e_pad = (n_edge_pad if n_edge_pad is not None
             else round_up(max(e, 1), edge_multiple))
    assert e_pad >= e, f"edge capacity {e_pad} < {e}"

    xp = np.zeros((n_pad, f), np.float32)
    xp[:n] = x
    sp = np.zeros((e_pad,), np.int32)
    sp[:e] = senders
    rp = np.full((e_pad,), n_pad - 1, np.int32)
    rp[:e] = receivers
    ap = np.zeros((e_pad, a), np.float32)
    ap[:e] = edge_attr

    yp = _pad_y(y, n_pad)
    sip = _pad_sample_idx(sample_idx, n_pad)

    sperm, sspan = _sender_sort(sp)
    return Graph(
        x=xp,
        senders=sp,
        receivers=rp,
        edge_attr=ap,
        n_node=np.int32(n),
        n_edge=np.int32(e),
        y=yp,
        sample_idx=sip,
        sorted_span=_sorted_span_flag(rp),
        sender_perm=sperm,
        sender_span=sspan,
    )


def _pad_y(y, n_pad):
    if y is None:
        return None
    y = np.asarray(y, np.float32)
    if y.ndim == 1:
        y = y[:, None]
    yp = np.zeros((n_pad, y.shape[1]), np.float32)
    yp[: y.shape[0]] = y
    return yp


def _pad_sample_idx(sample_idx, n_pad):
    if sample_idx is None:
        return None
    sample_idx = np.asarray(sample_idx, np.int32).reshape(-1)
    sip = np.zeros((n_pad,), np.int32)
    sip[: sample_idx.shape[0]] = sample_idx
    return sip


@struct.dataclass
class MultiLevelGraph:
    """An L-level multipole graph in a single padded node array.

    Node layout: level l occupies rows [points[l], points[l+1]) — level
    sizes are static (the generators sample exactly m[l] nodes per level,
    utilities.py:582-594), so no node padding is needed. Edge sets are
    concatenated with static per-level capacity ranges (the reference's
    concatenate+ranges trick, utilities.py:642-665, made static):

    - mid edges (K_ll): LOCAL per-level indices (the general MGKN applies
      K_ll on the level's node slice, MGKN_general_darcy2d.py:84-86).
    - down edges (K_{l,l+1}) and up edges (K_{l+1,l}): GLOBAL indices over
      the whole node array (residual convs on the full array).

    Static metadata (points, per-level capacity ranges) rides as pytree
    aux data so jit/vmap treat it as compile-time constants.
    """

    x: jnp.ndarray
    mid_senders: jnp.ndarray
    mid_receivers: jnp.ndarray
    mid_attr: jnp.ndarray
    mid_mask: jnp.ndarray
    down_senders: jnp.ndarray
    down_receivers: jnp.ndarray
    down_attr: jnp.ndarray
    down_mask: jnp.ndarray
    up_senders: jnp.ndarray
    up_receivers: jnp.ndarray
    up_attr: jnp.ndarray
    up_mask: jnp.ndarray
    y: Optional[jnp.ndarray] = None
    sample_idx: Optional[jnp.ndarray] = None
    points: tuple = struct.field(pytree_node=False, default=())
    mid_ranges: tuple = struct.field(pytree_node=False, default=())
    down_ranges: tuple = struct.field(pytree_node=False, default=())
    up_ranges: tuple = struct.field(pytree_node=False, default=())

    @property
    def level(self) -> int:
        return len(self.points) - 1


def _pad_edge_segments(edge_list, attr_list, caps, local_sizes,
                       edge_multiple):
    """Pads per-level (senders, receivers, attr) to static capacities and
    concatenates. ``local_sizes[l]`` is the padding receiver parking index
    for level l. Returns arrays + the static range tuple + capacities."""
    n_levels = len(edge_list)
    if caps is None:
        caps = tuple(round_up(max(e.shape[1], 1), edge_multiple)
                     for e in edge_list)
    a_dim = attr_list[0].shape[1]
    s_out, r_out, a_out, m_out, ranges = [], [], [], [], []
    start = 0
    for l in range(n_levels):
        e = edge_list[l].shape[1]
        cap = caps[l]
        assert cap >= e, f"edge capacity {cap} < {e} at level {l}"
        src = np.asarray(edge_list[l][0], np.int64)
        dst = np.asarray(edge_list[l][1], np.int64)
        attr = np.asarray(attr_list[l], np.float32)
        order = np.lexsort((src, dst))
        src, dst, attr = src[order], dst[order], attr[order]
        sp = np.zeros(cap, np.int32)
        sp[:e] = src
        rp = np.full(cap, local_sizes[l] - 1, np.int32)
        rp[:e] = dst
        ap = np.zeros((cap, a_dim), np.float32)
        ap[:e] = attr
        mp = np.zeros(cap, bool)
        mp[:e] = True
        s_out.append(sp)
        r_out.append(rp)
        a_out.append(ap)
        m_out.append(mp)
        ranges.append((start, start + cap))
        start += cap
    return (np.concatenate(s_out), np.concatenate(r_out),
            np.concatenate(a_out), np.concatenate(m_out),
            tuple(ranges), tuple(caps))


def build_multilevel_graph(
    x: np.ndarray,
    level_sizes,
    mid_edges, mid_attrs,
    down_edges, down_attrs,
    up_edges, up_attrs,
    *,
    y: Optional[np.ndarray] = None,
    sample_idx: Optional[np.ndarray] = None,
    mid_caps=None, down_caps=None, up_caps=None,
    edge_multiple: int = 256,
) -> MultiLevelGraph:
    """Builds a MultiLevelGraph from host-side per-level edge lists.

    mid_edges[l] must use GLOBAL indices (as produced by
    RandomMultiMeshGenerator.ball_connectivity); they are localized to the
    level's slice here. down/up edges stay global.
    """
    level_sizes = tuple(int(m) for m in level_sizes)
    points = (0,) + tuple(np.cumsum(level_sizes).tolist())
    n_tot = points[-1]
    x = np.asarray(x, np.float32)
    assert x.shape[0] == n_tot

    mid_local = []
    for l, ei in enumerate(mid_edges):
        ei = np.asarray(ei) - points[l]
        assert ei.min() >= 0 and ei.max() < level_sizes[l]
        mid_local.append(ei)

    mid = _pad_edge_segments(mid_local, mid_attrs, mid_caps, level_sizes,
                             edge_multiple)
    if len(down_edges) == 0:
        # single-level graphs (the neurips2_MGKN ablation) have no
        # inter-level edges; keep zero-size placeholders
        a_dim = mid[2].shape[1]
        empty = (np.zeros(0, np.int32), np.zeros(0, np.int32),
                 np.zeros((0, a_dim), np.float32), np.zeros(0, bool),
                 (), ())
        down = up = empty
    else:
        glob_sizes = [n_tot] * len(down_edges)
        down = _pad_edge_segments(down_edges, down_attrs, down_caps,
                                  glob_sizes, edge_multiple)
        up = _pad_edge_segments(up_edges, up_attrs, up_caps, glob_sizes,
                                edge_multiple)

    yp = None
    if y is not None:
        y = np.asarray(y, np.float32)
        if y.ndim == 1:
            y = y[:, None]
        yp = y
    sip = None
    if sample_idx is not None:
        sip = np.asarray(sample_idx, np.int32).reshape(-1)

    return MultiLevelGraph(
        x=x,
        mid_senders=mid[0], mid_receivers=mid[1], mid_attr=mid[2],
        mid_mask=mid[3],
        down_senders=down[0], down_receivers=down[1], down_attr=down[2],
        down_mask=down[3],
        up_senders=up[0], up_receivers=up[1], up_attr=up[2], up_mask=up[3],
        y=yp, sample_idx=sip,
        points=points, mid_ranges=mid[4], down_ranges=down[4],
        up_ranges=up[4],
    )


def stack_graphs(graphs) -> Graph:
    """Stacks same-capacity graphs along a new leading batch axis."""
    import jax

    graphs = list(graphs)
    if graphs and isinstance(graphs[0], Graph):
        # static aux must match across the stack; the span bounds only
        # hold for the batch if they hold for every member
        span = min(g.sorted_span for g in graphs)
        sspan = min(g.sender_span for g in graphs)
        graphs = [
            g.replace(sorted_span=span, sender_span=sspan,
                      sender_perm=g.sender_perm if sspan else None)
            if (g.sorted_span != span or g.sender_span != sspan)
            else g
            for g in graphs]
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *graphs)


def flatten_stacked(g: Graph) -> Graph:
    """Flattens a stacked batch of same-capacity graphs into ONE
    disjoint-union graph (PyG's batching strategy, done statically).

    The reference's DataLoader batches graphs as a disjoint union
    (node indices offset per graph, e.g. UAI1_full_resolution.py:223);
    our stacked layout instead vmaps per graph. For SMALL graphs the
    union layout feeds the segment/gather kernels one B*E-edge stream
    instead of B separate E-edge islands — longer MXU blocks, one
    aggregation instead of B (PERF_NOTES.md small-graph batching).

    jit-compatible (pure reshape + offset adds). Properties preserved:
    - receivers stay globally sorted: graph b's receivers (padding
      parked at N_pad-1) land in [b*N_pad, (b+1)*N_pad), below graph
      b+1's range.
    - the sorted-span bound still holds: per-graph edge capacities are
      _SORTED_BLOCK_EB multiples (edge_multiple=512 in build_graph), so
      no 512-edge block straddles a graph boundary.
    Valid nodes are NOT a prefix of the flat array — n_node is set to
    the full capacity and edge validity rides the explicit edge_valid
    mask; per-node losses must keep masking on the stacked view.
    """
    assert g.node_block == 0, "flatten_stacked: blocked-CSR not supported"
    assert g.x.ndim == 3, "flatten_stacked expects a stacked batch"
    b, n_pad = g.x.shape[0], g.x.shape[1]
    e_pad = g.senders.shape[1]
    offs = (jnp.arange(b, dtype=g.senders.dtype) * n_pad)[:, None]
    if g.edge_valid is not None:
        ev = g.edge_valid
    else:
        ev = jnp.arange(e_pad, dtype=g.n_edge.dtype)[None] < g.n_edge[:, None]
    return Graph(
        x=g.x.reshape(b * n_pad, -1),
        senders=(g.senders + offs).reshape(b * e_pad),
        receivers=(g.receivers + offs).reshape(b * e_pad),
        edge_attr=g.edge_attr.reshape(b * e_pad, -1),
        n_node=jnp.asarray(b * n_pad, jnp.int32),
        n_edge=jnp.asarray(b * e_pad, jnp.int32),
        y=None if g.y is None else g.y.reshape(b * n_pad, -1),
        sample_idx=(None if g.sample_idx is None
                    else g.sample_idx.reshape(b * n_pad)),
        edge_valid=ev.reshape(b * e_pad),
        sorted_span=g.sorted_span,
        # per-graph sender perms compose: graph b's sorted senders all
        # precede graph b+1's after the node offset, and per-graph edge
        # capacities are 512-multiples so no block straddles a boundary
        sender_perm=(None if g.sender_perm is None else
                     (g.sender_perm
                      + (jnp.arange(b, dtype=g.sender_perm.dtype)
                         * e_pad)[:, None]).reshape(b * e_pad)),
        sender_span=g.sender_span,
    )


def repad_edges(g: Graph, e_pad: int) -> Graph:
    """Grows a (non-blocked) graph's edge capacity to ``e_pad``.

    Edge capacities are MINIMUMS that grow on demand (sample-dependent
    edge counts mean capacities fitted on one batch can be exceeded by
    another); this pads the tail with masked edges parked at
    receiver = N_pad - 1, matching build_graph's convention."""
    assert g.node_block == 0, "repad_edges: blocked-CSR not supported"
    e = g.senders.shape[0]
    assert e_pad >= e, (e_pad, e)
    if e_pad == e:
        return g
    extra = e_pad - e
    n_pad = g.x.shape[0]
    receivers = np.concatenate(
        [np.asarray(g.receivers), np.full(extra, n_pad - 1, np.int32)])
    senders = np.concatenate(
        [np.asarray(g.senders), np.zeros(extra, np.int32)])
    sperm, sspan = _sender_sort(senders)
    return g.replace(
        senders=senders,
        receivers=receivers,
        edge_attr=np.concatenate(
            [np.asarray(g.edge_attr),
             np.zeros((extra, g.edge_attr.shape[1]), np.float32)]),
        sorted_span=_sorted_span_flag(receivers),
        sender_perm=sperm,
        sender_span=sspan,
    )


def pad_capacities(graphs) -> tuple:
    """Max (node, edge) capacity over a list of pre-pad (n, e) tuples."""
    n_max = max(g[0] for g in graphs)
    e_max = max(g[1] for g in graphs)
    return n_max, e_max


@struct.dataclass
class NodeBatch:
    """Per-sample node data riding on a SHARED edge structure.

    The layout for sample-independent connectivity: the full-grid
    lattice of neurips4_GCN.py:133 is the same for every sample, so
    stacking per-sample ``Graph``s would ship identical [E, 2] index
    arrays n_train times (~6 GB at s=421, n=1024). Instead one template
    ``Graph`` holds the structure (closure-captured into the jit) and
    the stacked dataset carries only what varies: node features,
    targets, and the valid-node count."""

    x: jnp.ndarray            # [B, N_pad, F]
    y: jnp.ndarray            # [B, N_pad, out]
    n_node: jnp.ndarray       # [B]


__all__ = [
    "Graph",
    "NodeBatch",
    "MultiLevelGraph",
    "build_graph",
    "build_multilevel_graph",
    "stack_graphs",
    "flatten_stacked",
    "repad_edges",
    "round_up",
]
