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
# speed. Gated by the one-hot's size; big-N graphs keep the scatter path.
_ONEHOT_MAX_BYTES = 64 * 1024 * 1024


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


def masked_segment_sum(data, segment_ids, mask, num_segments: int,
                       indices_are_sorted: bool = True,
                       method: str = "auto"):
    """Sum of ``data`` rows per segment, counting only masked-in rows."""
    m = mask.astype(data.dtype)
    if data.ndim > m.ndim:
        m = m.reshape(m.shape + (1,) * (data.ndim - m.ndim))
    return segment_sum(data * m, segment_ids, num_segments,
                       indices_are_sorted, method=method)


def masked_segment_mean(data, segment_ids, mask, num_segments: int,
                        indices_are_sorted: bool = True,
                        count_dtype=jnp.float32,
                        method: str = "auto"):
    """Scatter-mean with PyG semantics: nodes receiving no (valid) message
    get zeros (count clamped to 1 in the divisor)."""
    e = segment_ids.shape[0]
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


__all__ = [
    "segment_sum",
    "masked_segment_sum",
    "masked_segment_mean",
    "blocked_segment_mean",
    "segment_degrees",
    "gather_rows",
]
