"""Node-sharded execution of the multilevel (general) MGKN.

The multipole hierarchy (RandomMultiMeshGenerator,
multipole-graph-neural-operator/utilities.py:546-712) is SURVEY.md
section 2.6's flagged "natural hierarchical comm pattern": intra-level
K_ll edges stay mostly local, down/up K_{l,l+1}/K_{l+1,l} edges are the
inter-shard transfer pattern of the V-cycle
(MGKN_general_darcy2d.py:69-94).

Sharding scheme: every LEVEL's node set is split into S contiguous
blocks, so each device owns a proportional slice of every level (a
device's local node array is the concatenation of its per-level
blocks). All edges — down, mid, up — are bucketed host-side by the
shard of their RECEIVER; senders carry global indices into the
all-gathered node array. Each conv application all-gathers the [sum_l
n_l, width] features over ICI (gradients flow back as reduce-scatter,
inserted by shard_map's partial-eval of all_gather) and reduces its
edge bucket onto local nodes. The reference's in-place level-slice
update (MGKN_general_darcy2d.py:84-86) becomes a per-device local
slice update because each device's layout preserves level order.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.graph import MultiLevelGraph, round_up
from ..ops.edge_conv import _kernel_messages
from ..ops.segment import masked_segment_mean


def _level_layout(points, n_shards):
    """points: global level offsets (len L+1). Returns per-level local
    block sizes, local level offsets, and total local nodes."""
    sizes = [points[l + 1] - points[l] for l in range(len(points) - 1)]
    loc = [round_up(-(-n // n_shards), 8) for n in sizes]
    loc_offs = [0]
    for v in loc:
        loc_offs.append(loc_offs[-1] + v)
    return sizes, loc, loc_offs


def _map_nodes(ids, levels, points, loc, loc_offs):
    """Global concat-layout node ids -> (shard, local id within shard).

    ``levels`` gives each id's level (precomputed by the caller when
    known; pass None to derive from ``points``)."""
    ids = np.asarray(ids, np.int64)
    if levels is None:
        levels = np.searchsorted(np.asarray(points), ids,
                                 side="right") - 1
    within = ids - np.asarray(points)[levels]
    loc_arr = np.asarray(loc)[levels]
    shard = within // loc_arr
    local = within - shard * loc_arr + np.asarray(loc_offs)[levels]
    return shard.astype(np.int64), local.astype(np.int64)


def _bucket_edges(senders_g, receivers_sh, receivers_loc, attr, valid,
                  n_shards, park, edge_multiple):
    """Groups edges by receiver shard into fixed-capacity buckets.

    senders_g: gathered-domain sender ids. receivers_sh/loc: shard and
    local receiver ids. park: local parking index for padding edges."""
    S = n_shards
    e_loc = 1
    sels = []
    for s in range(S):
        sel = (receivers_sh == s) & valid
        sels.append(sel)
        e_loc = max(e_loc, int(sel.sum()))
    e_loc = round_up(e_loc, edge_multiple)
    a_dim = attr.shape[1]
    out_s = np.zeros((S, e_loc), np.int32)
    out_r = np.full((S, e_loc), park, np.int32)
    out_a = np.zeros((S, e_loc, a_dim), np.float32)
    out_m = np.zeros((S, e_loc), bool)
    for s in range(S):
        sel = sels[s]
        e = int(sel.sum())
        out_s[s, :e] = senders_g[sel]
        out_r[s, :e] = receivers_loc[sel]
        out_a[s, :e] = attr[sel]
        out_m[s, :e] = True
    return {"senders": out_s, "receivers": out_r, "attr": out_a,
            "mask": out_m}


def partition_multilevel_graph(g: MultiLevelGraph, n_shards: int,
                               edge_multiple: int = 64):
    """Host-side partition of one multilevel graph for S devices.

    Returns (parts, meta): parts is a pytree of arrays with leading axis
    n_shards (shard_map inputs); meta holds the static layout
    (per-level local sizes/offsets) the sharded forward needs."""
    S = n_shards
    points = tuple(int(p) for p in g.points)
    L = len(points) - 1
    sizes, loc, loc_offs = _level_layout(points, S)
    n_loc_tot = loc_offs[-1]

    x = np.asarray(g.x)
    f_dim = x.shape[1]
    x_sh = np.zeros((S, n_loc_tot, f_dim), np.float32)
    nmask = np.zeros((S, n_loc_tot), bool)
    for l in range(L):
        lvl = x[points[l]:points[l + 1]]
        pad = np.zeros((S * loc[l], f_dim), np.float32)
        pad[: sizes[l]] = lvl
        x_sh[:, loc_offs[l]:loc_offs[l + 1]] = pad.reshape(S, loc[l],
                                                           f_dim)
        m = np.zeros(S * loc[l], bool)
        m[: sizes[l]] = True
        nmask[:, loc_offs[l]:loc_offs[l + 1]] = m.reshape(S, loc[l])

    def gathered_id(shard, local):
        return shard * n_loc_tot + local

    down, mid, up = [], [], []
    # down/up: global-index edges over the whole node array
    for kind, snd, rcv, attr, msk, ranges, out in (
        ("down", g.down_senders, g.down_receivers, g.down_attr,
         g.down_mask, g.down_ranges, down),
        ("up", g.up_senders, g.up_receivers, g.up_attr, g.up_mask,
         g.up_ranges, up),
    ):
        snd = np.asarray(snd)
        rcv = np.asarray(rcv)
        attr = np.asarray(attr)
        msk = np.asarray(msk).astype(bool)
        for l in range(L - 1):
            r0, r1 = ranges[l]
            s_sh, s_loc = _map_nodes(snd[r0:r1], None, points, loc,
                                     loc_offs)
            r_sh, r_loc = _map_nodes(rcv[r0:r1], None, points, loc,
                                     loc_offs)
            out.append(_bucket_edges(
                gathered_id(s_sh, s_loc), r_sh, r_loc, attr[r0:r1],
                msk[r0:r1], S, n_loc_tot - 1, edge_multiple))
    # mid: LEVEL-LOCAL indices (conv applied on the level slice)
    m_snd = np.asarray(g.mid_senders)
    m_rcv = np.asarray(g.mid_receivers)
    m_attr = np.asarray(g.mid_attr)
    m_msk = np.asarray(g.mid_mask).astype(bool)
    for l in range(L):
        r0, r1 = g.mid_ranges[l]
        snd_l = m_snd[r0:r1].astype(np.int64)
        rcv_l = m_rcv[r0:r1].astype(np.int64)
        lv = np.full(snd_l.shape, l)
        s_sh, s_loc = _map_nodes(snd_l + points[l], lv, points, loc,
                                 loc_offs)
        r_sh = rcv_l // loc[l]
        r_loc = rcv_l - r_sh * loc[l]  # slice-local (within level block)
        mid.append(_bucket_edges(
            gathered_id(s_sh, s_loc), r_sh, r_loc, m_attr[r0:r1],
            m_msk[r0:r1], S, loc[l] - 1, edge_multiple))

    parts = {"x": x_sh, "node_mask": nmask, "down": down, "mid": mid,
             "up": up}
    meta = {"loc": tuple(loc), "loc_offs": tuple(loc_offs),
            "n_loc_tot": n_loc_tot, "points": points}
    return parts, meta


def _gathered_conv(x_all, bucket, kernel_params, width, out_size,
                   impl: str = "reference"):
    """Messages from the all-gathered features, reduced onto out_size
    local rows (masked mean — PyG scatter_mean parity). impl 'pallas' /
    'pallas_interpret' takes the fused message kernel on the local edge
    bucket (the gather out of the all-gathered features happens inside
    the kernel — same pattern as halo.node_sharded_conv_local)."""
    if impl in ("pallas", "pallas_interpret"):
        from ..ops.pallas_edge_conv import fused_edge_messages

        msg = fused_edge_messages(
            x_all, bucket["senders"], bucket["attr"], kernel_params,
            in_channels=width, out_channels=width,
            interpret=(impl == "pallas_interpret"))
    else:
        x_src = x_all[bucket["senders"]]
        msg = _kernel_messages(x_src, bucket["attr"], kernel_params,
                               width, width, "full", None)
    return masked_segment_mean(msg, bucket["receivers"], bucket["mask"],
                               out_size)


def mgkn_general_apply_node_sharded(params, cfg, parts, meta, mesh: Mesh,
                                    axis: str = "data",
                                    impl: str = "reference") -> jnp.ndarray:
    """Node-sharded forward of the general MGKN V-cycle.

    Returns [S * loc0, out_width]; the first points[1] rows are the
    finest-level predictions in original node order (each shard's block
    is a contiguous chunk of level 0). impl: 'reference' |
    'pallas' | 'pallas_interpret' (fused conv kernel inside shard_map —
    interpret mode for CPU meshes)."""
    from jax import shard_map

    L = cfg.level
    loc = meta["loc"]
    lo = meta["loc_offs"]
    n_loc_tot = meta["n_loc_tot"]
    width = cfg.width

    def body(x, down, mid, up):
        x = jax.tree_util.tree_map(lambda a: a[0], x)
        down = jax.tree_util.tree_map(lambda a: a[0], down)
        mid = jax.tree_util.tree_map(lambda a: a[0], mid)
        up = jax.tree_util.tree_map(lambda a: a[0], up)

        h = x @ params["fc_in"]["w"] + params["fc_in"]["b"]
        for _ in range(cfg.depth):
            for l in range(L - 1):
                h_all = jax.lax.all_gather(h, axis, axis=0, tiled=True)
                h = h + _gathered_conv(h_all, down[l],
                                       params["conv_down"][l]["kernel"],
                                       width, n_loc_tot, impl=impl)
                h = jax.nn.relu(h)
            for l in reversed(range(L)):
                h_all = jax.lax.all_gather(h, axis, axis=0, tiled=True)
                h_slice = h[lo[l]:lo[l + 1]]
                delta = _gathered_conv(h_all, mid[l],
                                       params["conv_mid"][l]["kernel"],
                                       width, loc[l], impl=impl)
                if cfg.variant == "mkgn":
                    # in-place K_ll on the level slice, root term, no
                    # ReLU (MGKN_general_darcy2d.py:84-86)
                    new = delta + h_slice @ params["conv_mid"][l]["root"]
                    h = h.at[lo[l]:lo[l + 1]].set(new)
                else:
                    h = h.at[lo[l]:lo[l + 1]].add(delta)
                    h = jax.nn.relu(h)
                if l > 0:
                    h_all = jax.lax.all_gather(h, axis, axis=0,
                                               tiled=True)
                    h = h + _gathered_conv(
                        h_all, up[l - 1],
                        params["conv_up"][l - 1]["kernel"], width,
                        n_loc_tot, impl=impl)
                    h = jax.nn.relu(h)

        h0 = h[lo[0]:lo[1]]
        h0 = jax.nn.relu(h0 @ params["fc_out1"]["w"]
                         + params["fc_out1"]["b"])
        h0 = h0 @ params["fc_out2"]["w"] + params["fc_out2"]["b"]
        return h0[None]

    spec_tree = jax.tree_util.tree_map(lambda _: P(axis), parts)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_tree["x"], spec_tree["down"], spec_tree["mid"],
                  spec_tree["up"]),
        out_specs=P(axis),
        # pallas_call cannot annotate its outputs' varying-mesh-axes
        # (same constraint as halo.gkn_apply_node_sharded)
        check_vma=not impl.startswith("pallas"),
    )
    out = fn(parts["x"], parts["down"], parts["mid"], parts["up"])
    return out.reshape(-1, out.shape[-1])


# --------------------------------------------------------------------
# Orthogonal MGKN (1-d dyadic hierarchy): sharded fine levels +
# agglomerated coarse levels — the classic parallel-multigrid pattern.
# Fine levels keep x block-sharded on the sequence axis (pooling and
# nearest-upsampling are block-local because block lengths stay even);
# once a level's per-device block would fall below ``min_block`` (or
# stop dividing evenly), the state is all-gathered and the coarse
# levels compute replicated, re-sharding by local slice on the way up.
# Reference V-cycle: MGKN_orthogonal_burgers1d.py:59-86.

def _orth_grid_lengths(s: int, n_edge_sets: int):
    """Edge set i lives on the grid of length s / 2^max(i-1, 0)
    (set 0: finest NN edges; set i>=1: level-i interactive edges applied
    to phi[i-1] — models/mgkn_orthogonal.py:134-152)."""
    return [s // (2 ** max(i - 1, 0)) for i in range(n_edge_sets)]


def partition_multipole1d(g, n_shards: int, min_block: int = 8,
                          edge_multiple: int = 64):
    """Host-side partition of one MultipoleGraph1D for S devices.

    Returns (parts, meta). Levels whose per-device block is at least
    ``min_block`` and even are sharded; coarser ones are replicated
    (meta['sharded_level'][l]). Sharded edge sets are bucketed by
    receiver block; replicated ones keep their full edge lists."""
    s = g.x.shape[0]
    S = n_shards
    n_sets = len(g.senders)
    glens = _orth_grid_lengths(s, n_sets)
    level = n_sets - 1

    def level_sharded(length):
        return length % S == 0 and length // S >= min_block \
            and (length // S) % 2 == 0

    edge_parts = []
    for i in range(n_sets):
        gl = glens[i]
        snd = np.asarray(g.senders[i], np.int64)
        rcv = np.asarray(g.receivers[i], np.int64)
        attr = np.asarray(g.attrs[i], np.float32)
        if not level_sharded(gl):
            edge_parts.append({
                "senders": np.broadcast_to(snd, (S,) + snd.shape).copy(),
                "receivers": np.broadcast_to(rcv,
                                             (S,) + rcv.shape).copy(),
                "attr": np.broadcast_to(attr, (S,) + attr.shape).copy(),
                "mask": np.ones((S, snd.shape[0]), bool),
            })
            continue
        blk = gl // S
        r_sh = rcv // blk
        edge_parts.append(_bucket_edges(
            snd, r_sh, rcv - r_sh * blk, attr,
            np.ones(snd.shape[0], bool), S, blk - 1, edge_multiple))

    x = np.asarray(g.x, np.float32)
    if not level_sharded(s):
        raise ValueError(
            f"s={s} over {S} shards gives blocks under min_block="
            f"{min_block} (or uneven); node sharding is not useful "
            "here — run unsharded")
    blk0 = s // S
    parts = {
        "x": x.reshape(S, blk0, -1),
        "edges": edge_parts,
    }
    meta = {
        "s": s,
        "glens": tuple(glens),
        "set_sharded": tuple(level_sharded(gl) for gl in glens),
        # x at level l has length s/2^l; sharded iff that length is
        "lvl_sharded": tuple(level_sharded(s // (2 ** l))
                             for l in range(level)),
    }
    return parts, meta


def _orth_conv(x_state, sharded_in, bucket, conv_params, width, axis,
               out_len_loc, impl: str = "reference"):
    """One edge-kernel conv on the (sharded or replicated) level state.
    x_state is local [blk, w] when sharded_in else the full [gl, w]."""
    if sharded_in:
        x_all = jax.lax.all_gather(x_state, axis, axis=0, tiled=True)
        out_size = out_len_loc
    else:
        x_all = x_state
        out_size = x_state.shape[0]
    if impl in ("pallas", "pallas_interpret"):
        from ..ops.pallas_edge_conv import fused_edge_messages

        msg = fused_edge_messages(
            x_all, bucket["senders"], bucket["attr"],
            conv_params["kernel"], in_channels=width, out_channels=width,
            interpret=(impl == "pallas_interpret"))
    else:
        x_src = x_all[bucket["senders"]]
        msg = _kernel_messages(x_src, bucket["attr"],
                               conv_params["kernel"], width, width,
                               "full", None)
    out = masked_segment_mean(msg, bucket["receivers"], bucket["mask"],
                              out_size)
    out = out + x_state @ conv_params["root"] + conv_params["bias"]
    return out


def mgkn_orthogonal_apply_node_sharded(params, cfg, parts, meta,
                                       mesh: Mesh, axis: str = "data",
                                       impl: str = "reference"):
    """Node-sharded forward of the orthogonal MGKN V-cycle.

    Returns [s, out_width] predictions in original order (contiguous
    blocks reassemble the sequence). impl: 'reference' | 'pallas' |
    'pallas_interpret' (fused conv kernel inside shard_map)."""
    from jax import shard_map
    from ..ops.pooling import upsample_nearest_1d, avg_pool_1d

    level = cfg.level
    width = cfg.width
    S = mesh.devices.size
    lvl_sharded = meta["lvl_sharded"]

    def to_mode(x, was_sharded, want_sharded, me, length):
        if was_sharded == want_sharded:
            return x
        if was_sharded:  # agglomerate
            return jax.lax.all_gather(x, axis, axis=0, tiled=True)
        blk = length // S
        return jax.lax.dynamic_slice_in_dim(x, me * blk, blk, axis=0)

    def body(x, *edges):
        x = x[0]
        edges = [jax.tree_util.tree_map(lambda a: a[0], e) for e in edges]
        me = jax.lax.axis_index(axis)

        h = x @ params["fc1"]["w"] + params["fc1"]["b"]
        for _ in range(cfg.depth):
            phi = [None] * level
            cur_sharded = lvl_sharded[0]
            for l in range(level):
                want = lvl_sharded[l]
                h = to_mode(h, cur_sharded, want, me,
                            meta["s"] // (2 ** l))
                cur_sharded = want
                phi[l] = (h, cur_sharded)
                if l != level - 1:
                    h = avg_pool_1d(h, 2)
            # coarsest conv (edge set `level` on phi[level-1]'s grid)
            ph, ph_sh = phi[level - 1]
            assert ph_sh == meta["set_sharded"][level]
            h = jax.nn.relu(h + _orth_conv(
                ph, ph_sh, edges[level], params["conv"][level], width,
                axis, ph.shape[0], impl=impl))
            for l in reversed(range(level)):
                if l != 0:
                    h = upsample_nearest_1d(h, 2)
                    ph, ph_sh = phi[l - 1]
                    # h now lives on phi[l-1]'s grid; match its mode
                    h = to_mode(h, cur_sharded, ph_sh, me,
                                meta["s"] // (2 ** (l - 1)))
                    cur_sharded = ph_sh
                    h = jax.nn.relu(h + _orth_conv(
                        ph, ph_sh, edges[l], params["conv"][l], width,
                        axis, ph.shape[0], impl=impl))
                else:
                    ph, ph_sh = phi[0]
                    h = jax.nn.relu(h + _orth_conv(
                        ph, ph_sh, edges[0], params["conv"][0], width,
                        axis, ph.shape[0], impl=impl))
        h = jax.nn.relu(h @ params["fc2"]["w"] + params["fc2"]["b"])
        h = h @ params["fc3"]["w"] + params["fc3"]["b"]
        return h[None]

    spec_x = P(axis)
    spec_edges = tuple(
        jax.tree_util.tree_map(lambda _: P(axis), e)
        for e in parts["edges"])
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_x,) + spec_edges,
        out_specs=P(axis),
        check_vma=not impl.startswith("pallas"),
    )
    out = fn(parts["x"], *parts["edges"])
    return out.reshape(-1, out.shape[-1])


__all__ = [
    "partition_multilevel_graph",
    "mgkn_general_apply_node_sharded",
    "partition_multipole1d",
    "mgkn_orthogonal_apply_node_sharded",
]
