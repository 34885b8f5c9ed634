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


def segment_sum(data, segment_ids, num_segments: int,
                indices_are_sorted: bool = True):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def masked_segment_sum(data, segment_ids, mask, num_segments: int,
                       indices_are_sorted: bool = True):
    """Sum of ``data`` rows per segment, counting only masked-in rows."""
    m = mask.astype(data.dtype)
    if data.ndim > m.ndim:
        m = m.reshape(m.shape + (1,) * (data.ndim - m.ndim))
    return segment_sum(data * m, segment_ids, num_segments,
                       indices_are_sorted)


def masked_segment_mean(data, segment_ids, mask, num_segments: int,
                        indices_are_sorted: bool = True,
                        count_dtype=jnp.float32):
    """Scatter-mean with PyG semantics: nodes receiving no (valid) message
    get zeros (count clamped to 1 in the divisor)."""
    total = masked_segment_sum(data, segment_ids, mask, num_segments,
                               indices_are_sorted)
    counts = segment_sum(mask.astype(count_dtype), segment_ids,
                         num_segments, indices_are_sorted)
    counts = jnp.maximum(counts, 1.0)
    if data.ndim > counts.ndim:
        counts = counts.reshape(counts.shape + (1,) * (data.ndim - counts.ndim))
    return total / counts.astype(total.dtype)


def segment_degrees(segment_ids, mask, num_segments: int,
                    indices_are_sorted: bool = True):
    return segment_sum(mask.astype(jnp.float32), segment_ids, num_segments,
                       indices_are_sorted)


__all__ = [
    "segment_sum",
    "masked_segment_sum",
    "masked_segment_mean",
    "segment_degrees",
]
