"""Masked segment reductions for padded edge lists.

TPU-native replacement for torch-scatter's CUDA scatter_add/scatter_mean
(the L0 layer of the reference, invoked from PyG MessagePassing.propagate,
graph-neural-operator/nn_conv.py:271). Edge lists are receiver-sorted with
padding at the tail, so ``indices_are_sorted=True`` lets XLA lower to an
efficient sorted-segment reduction instead of generic scatter.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# XLA lowers scatter-add to a serialized loop on TPU — measured ~1.4 ms
# per [5k-edge, 64] segment reduction, dominating the GKN step. For the
# Nystrom regime (hundreds..thousands of nodes) we instead express the
# reduction as a one-hot matmul on the MXU: out = onehot(ids)^T @ data.
# The one-hot is built from iota compares (VPU) and the matmul runs at MXU
# speed. Gated by the one-hot's size; big-N graphs take the block-local
# one-hot path below when the builder verified the span bound, else the
# scatter fallback.
_ONEHOT_MAX_BYTES = 64 * 1024 * 1024

# Block-local one-hot reduction for RECEIVER-SORTED edge lists at large N
# (where the full [E, N] one-hot is too big): within any run of
# _SORTED_BLOCK_EB consecutive edges, sortedness bounds the receiver SPAN,
# so each block reduces onto a small local one-hot ([eb, span] MXU matmul)
# and only nb*span partial rows hit the scatter — ~E/eb*span instead of E.
# Measured at UAI1 full-grid scale (N=3728, E=383k, w=64, v5e): 3.1 ms fwd
# / 4.8 ms fwd+bwd vs 8.9 / 9.6 for the sorted XLA scatter and 5.1 / 9.0
# for a cumsum-diff formulation (scripts/segsum_shootout.py). The span
# bound is a data property — verified HOST-SIDE at graph build
# (graph/graph.py build_graph -> Graph.sorted_span, static aux) and
# threaded here via ``sorted_span``.
_SORTED_BLOCK_EB = 512


def _use_onehot(num_edges: int, num_segments: int) -> bool:
    return num_edges * num_segments * 4 <= _ONEHOT_MAX_BYTES


def _onehot(segment_ids, num_segments: int, dtype):
    seg = jax.lax.broadcasted_iota(
        jnp.int32, (segment_ids.shape[0], num_segments), 1)
    return (segment_ids[:, None] == seg).astype(dtype)


def segment_sum(data, segment_ids, num_segments: int,
                indices_are_sorted: bool = True,
                method: str = "auto"):
    if method == "onehot" or (
            method == "auto"
            and _use_onehot(segment_ids.shape[0], num_segments)):
        oh = _onehot(segment_ids, num_segments, data.dtype)
        flat = data if data.ndim == 2 else data[:, None]
        out = jax.lax.dot_general(
            oh, flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(data.dtype)
        return out if data.ndim == 2 else out[:, 0]
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def sorted_block_segment_reduce(data, receivers, mask, num_segments: int,
                                span: int, mean: bool):
    """Masked segment mean/sum over a receiver-sorted [E, w] edge stream
    via block-local one-hot MXU matmuls (see _SORTED_BLOCK_EB note).

    Requires (caller-verified, host-side): receivers sorted ascending,
    E % _SORTED_BLOCK_EB == 0, and within every _SORTED_BLOCK_EB-edge
    block max(receiver) - min(receiver) < span. Counts are exact (0/1
    products, f32 accumulation); data rows see MXU bf16 input rounding —
    the same contract as the full one-hot path.
    """
    e = receivers.shape[0]
    eb = _SORTED_BLOCK_EB
    nb = e // eb
    m = mask.astype(data.dtype)
    aug = jnp.concatenate([data * m[:, None], m[:, None]], axis=1)
    rb = receivers.reshape(nb, eb)
    base = rb[:, 0]
    local = rb - base[:, None]  # in [0, span) by the builder's bound
    seg = jax.lax.broadcasted_iota(jnp.int32, (nb, eb, span), 2)
    oh = (local[:, :, None] == seg).astype(data.dtype)
    part = jax.lax.dot_general(
        oh, aug.reshape(nb, eb, -1),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [nb, span, w+1]
    ids = (base[:, None]
           + jnp.arange(span, dtype=receivers.dtype)[None]).reshape(-1)
    # nb*span rows (~E/eb*span << E): the scatter cost scales with rows
    out = jax.ops.segment_sum(part.reshape(nb * span, -1), ids,
                              num_segments=num_segments + span)
    out = out[:num_segments]
    total = out[:, :-1]
    if mean:
        counts = jnp.maximum(out[:, -1:], 1.0)
        return (total / counts).astype(data.dtype)
    return total.astype(data.dtype)


def _use_sorted_block(method, sorted_span, indices_are_sorted, e,
                      num_segments):
    if method == "blockoh":
        # forcing blockoh without a host-verified span bound would
        # SILENTLY DROP edges whose block-local index exceeds the
        # default span (one-hot rows matching no column) — require the
        # builder-verified Graph.sorted_span instead of guessing
        if sorted_span <= 0:
            raise ValueError(
                "method='blockoh' requires a host-verified receiver-span "
                "bound (build the graph via build_graph so Graph."
                "sorted_span is set, and pass sorted_span=graph."
                "sorted_span); refusing to guess a span")
        if e % _SORTED_BLOCK_EB != 0:
            raise ValueError(
                f"method='blockoh' needs E % {_SORTED_BLOCK_EB} == 0 "
                f"(got E={e}); pad edges to a {_SORTED_BLOCK_EB}-multiple")
        return True
    return (method == "auto" and sorted_span > 0 and indices_are_sorted
            and not _use_onehot(e, num_segments)
            and e % _SORTED_BLOCK_EB == 0)


def masked_segment_sum(data, segment_ids, mask, num_segments: int,
                       indices_are_sorted: bool = True,
                       method: str = "auto", sorted_span: int = 0):
    """Sum of ``data`` rows per segment, counting only masked-in rows."""
    if data.ndim == 2 and _use_sorted_block(
            method, sorted_span, indices_are_sorted, segment_ids.shape[0],
            num_segments):
        return sorted_block_segment_reduce(
            data, segment_ids, mask, num_segments,
            span=sorted_span, mean=False)
    m = mask.astype(data.dtype)
    if data.ndim > m.ndim:
        m = m.reshape(m.shape + (1,) * (data.ndim - m.ndim))
    return segment_sum(data * m, segment_ids, num_segments,
                       indices_are_sorted, method=method)


def masked_segment_mean(data, segment_ids, mask, num_segments: int,
                        indices_are_sorted: bool = True,
                        count_dtype=jnp.float32,
                        method: str = "auto", sorted_span: int = 0):
    """Scatter-mean with PyG semantics: nodes receiving no (valid) message
    get zeros (count clamped to 1 in the divisor)."""
    e = segment_ids.shape[0]
    if data.ndim == 2 and _use_sorted_block(
            method, sorted_span, indices_are_sorted, e, num_segments):
        return sorted_block_segment_reduce(
            data, segment_ids, mask, num_segments,
            span=sorted_span, mean=True)
    if method == "onehot" or (method == "auto"
                              and _use_onehot(e, num_segments)):
        # one matmul produces sums and counts together:
        # onehot^T @ [data * m | m]
        m = mask.astype(data.dtype)
        aug = jnp.concatenate([data * m[:, None], m[:, None]], axis=1)
        oh = _onehot(segment_ids, num_segments, data.dtype)
        out = jax.lax.dot_general(
            oh, aug, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        total = out[:, :-1]
        counts = jnp.maximum(out[:, -1:], 1.0)
        return (total / counts).astype(data.dtype)
    total = masked_segment_sum(data, segment_ids, mask, num_segments,
                               indices_are_sorted, method="scatter")
    counts = jax.ops.segment_sum(
        mask.astype(count_dtype), segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    counts = jnp.maximum(counts, 1.0)
    if data.ndim > counts.ndim:
        counts = counts.reshape(counts.shape + (1,) * (data.ndim - counts.ndim))
    return total / counts.astype(total.dtype)


def segment_degrees(segment_ids, mask, num_segments: int,
                    indices_are_sorted: bool = True):
    return segment_sum(mask.astype(jnp.float32), segment_ids, num_segments,
                       indices_are_sorted)


def blocked_segment_mean(data, receivers, mask, num_segments: int,
                         node_block: int, aggr: str = "mean"):
    """MXU segment reduction for the blocked-CSR layout (graph.build_graph
    with node_block set): edges come grouped per node block with local
    receivers in [b*nb, (b+1)*nb), so the one-hot is block-local —
    [n_blocks, eb, nb] instead of [E, N] — bounded at any N.
    """
    e_pad = receivers.shape[0]
    n_blocks = num_segments // node_block
    eb = e_pad // n_blocks
    m = mask.astype(data.dtype)
    aug = jnp.concatenate([data * m[:, None], m[:, None]], axis=1)
    aug = aug.reshape(n_blocks, eb, -1)
    recv_local = (receivers.reshape(n_blocks, eb)
                  - (jnp.arange(n_blocks) * node_block)[:, None])
    seg = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, eb, node_block), 2)
    oh = (recv_local[:, :, None] == seg).astype(data.dtype)
    out = jax.lax.dot_general(
        oh, aug, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [n_blocks, nb, w+1]
    out = out.reshape(num_segments, -1)
    total = out[:, :-1]
    if aggr == "mean":
        counts = jnp.maximum(out[:, -1:], 1.0)
        return (total / counts).astype(data.dtype)
    return total.astype(data.dtype)


def gather_rows(x, idx, method: str = "auto"):
    """x[idx] — as a one-hot matmul when small enough (XLA TPU gather on
    row indices is slow for the same reason scatter is)."""
    if method == "onehot" or (method == "auto"
                              and _use_onehot(idx.shape[0], x.shape[0])):
        oh = _onehot(idx, x.shape[0], x.dtype)
        return jnp.dot(oh, x, preferred_element_type=jnp.float32).astype(
            x.dtype)
    return x[idx]


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_rows_st(x, senders, sender_perm, span):
    del sender_perm, span
    return gather_rows(x, senders)


def _gather_rows_st_fwd(x, senders, sender_perm, span):
    return (_gather_rows_st(x, senders, sender_perm, span),
            (x.shape[0], senders, sender_perm))


def _gather_rows_st_bwd(span, res, dg):
    n, senders, sender_perm = res
    srt = dg[sender_perm]
    s_sorted = senders[sender_perm]
    ones = jnp.ones((senders.shape[0],), dg.dtype)
    dx = sorted_block_segment_reduce(srt, s_sorted, ones, n,
                                     span=span, mean=False)
    return dx.astype(dg.dtype), None, None


_gather_rows_st.defvjp(_gather_rows_st_fwd, _gather_rows_st_bwd)


def gather_rows_st(x, senders, sender_perm, sender_span: int):
    """x[senders] whose TRANSPOSE is scatter-free.

    XLA lowers the gather's backward (scatter-add of [E, w] cotangents
    into [N, w] by sender) to a serialized random scatter — 35.9 ms
    ISOLATED at E=1.2M vs 20.0 ms for this formulation (round-3
    scripts/fused_bwd_breakdown.py, real v5e): permute the cotangent to
    sender-sorted order (random row gather, 18.5 ms) then reduce with
    the block-local one-hot machinery that already replaced the
    receiver-side scatter (1.5 ms; sorted_block_segment_reduce).
    IN SITU the win shrinks to ~3 ms per conv backward (118.6 ->
    115.2 ms full fused step arm) — XLA overlaps much of the scatter
    with surrounding work; kept as a small, parity-tested win.

    Requires the builder-verified sender-sorted span bound
    (graph.sender_perm / graph.sender_span from build_graph); callers
    should fall back to gather_rows when sender_span == 0.

    The forward value is identical to gather_rows; padding edges carry
    zero cotangents (masked out of the loss) so no mask is needed in
    the reduction.
    """
    assert sender_span > 0, "gather_rows_st needs a verified span bound"
    return _gather_rows_st(x, senders, sender_perm, sender_span)


# Minimum per-graph (padded) edge count for the sender-sorted gather to
# pay for itself. Measured (round-4 bisect of the BENCH_r03 regression,
# real v5e): at bench scale (E=4.6k/graph, vmapped batch 20) default-on
# sender-sort REGRESSED the GKN epoch 27% (0.0728 -> 0.0928 s) — the
# permutation gather + block-reduce machinery don't amortize on small
# graphs; at E=1.2M it wins ~3% (PERF_NOTES round 3). Threshold set at
# the smallest scale where a win was measured being conservative about
# the unmeasured middle.
SENDER_SORT_MIN_E = 1 << 19  # 524288


def use_sender_sort(sender_perm, sender_span: int, e: int) -> bool:
    """Central gate for the scatter-free sender-sorted gather: requires
    the builder-verified span AND a large enough edge stream."""
    return (sender_perm is not None and sender_span > 0
            and e >= SENDER_SORT_MIN_E)


__all__ = [
    "segment_sum",
    "masked_segment_sum",
    "masked_segment_mean",
    "blocked_segment_mean",
    "sorted_block_segment_reduce",
    "segment_degrees",
    "gather_rows",
    "gather_rows_st",
    "use_sender_sort",
    "SENDER_SORT_MIN_E",
]
