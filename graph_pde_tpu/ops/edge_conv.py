"""Edge-conditioned kernel convolution — the workhorse op.

Semantics of the reference ``NNConv_old`` / PyG ``NNConv``
(graph-neural-operator/nn_conv.py:197-288):

    out_i = aggr_{j in N(i)} [ x_j @ kappa(e_ji) ]  (+ x_i @ root) (+ bias)

with kappa a per-edge MLP producing a [w_in, w_out] matrix ('full'), a
diagonal ('diag', nn_conv.py:84-85), or the hand-built Gaussian kernel
('gaussian', nn_conv.py:174-183). Aggregation is scatter-mean (all GKN /
MGKN models pass aggr='mean') or scatter-add; self-loops are part of the
radius graph (distance-0 pairs), matching the reference.

Execution paths (``impl``):
  - 'reference': straight XLA — gather, MLP, reshape [E, w_in, w_out],
    einsum, sorted-segment reduce. Materializes E x w_in x w_out in HBM;
    fine for small graphs, the oracle for parity tests.
  - 'scan': processes edges in fixed-size chunks under lax.map, so only
    [chunk, w_in*w_out] kernel matrices exist at once. Bounded memory at
    full-resolution edge counts (the reference's [E, 4096] materialization,
    nn_conv.py:274, is the memory cliff SURVEY.md 7.4 calls out).
  - 'pallas': fused TPU kernel (graph_pde_tpu.ops.pallas_edge_conv) that
    computes the kernel MLP and the per-edge contraction in VMEM and never
    writes the kernel matrices to HBM.
  - 'auto': picks pallas on TPU when the kernel shape is supported, else
    scan for large E, else reference. (Models additionally offer
    impl='kcached' — kernel matrices computed once per forward and reused
    across the depth iterations; see models/gkn.py.)

All paths accept a validity mask over padded edges; mean-aggregation
counts only valid edges (PyG scatter_mean parity).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .dense import dense_apply
from .segment import (masked_segment_mean, masked_segment_sum,
                      blocked_segment_mean, gather_rows)

_REFERENCE_MAX_KERNEL_ELEMS = 64 * 1024 * 1024  # E * w_in * w_out threshold


def _kernel_messages(x_src, edge_attr, kernel_params, in_channels,
                     out_channels, kernel_type, compute_dtype):
    """Per-edge messages x_j @ kappa(e). x_src: [E', w_in]."""
    if compute_dtype is not None:
        x_src = x_src.astype(compute_dtype)
        edge_attr = edge_attr.astype(compute_dtype)
        kernel_params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), kernel_params)
    k = dense_apply(kernel_params, edge_attr)
    if kernel_type == "diag":
        # diag_embed(nn(e)): message = x_j * k elementwise (nn_conv.py:84-85)
        return x_src * k
    w = k.reshape(x_src.shape[0], in_channels, out_channels)
    return jnp.einsum(
        "ei,eio->eo", x_src, w,
        preferred_element_type=jnp.float32).astype(jnp.float32)


def edge_kernel_conv(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mask: jnp.ndarray,
    kernel_params,
    *,
    in_channels: int,
    out_channels: int,
    aggr: str = "mean",
    root: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    kernel_type: str = "full",
    impl: str = "auto",
    chunk_size: int = 1024,
    compute_dtype=None,
    node_block: int = 0,
    sorted_span: int = 0,
    sender_sort=None,
) -> jnp.ndarray:
    """Applies the edge-conditioned convolution on one padded graph.

    Args:
      x: [N, w_in] node features (padded).
      senders/receivers: [E] int32, receiver-sorted, padding at tail.
      edge_attr: [E, A].
      edge_mask: [E] validity mask.
      kernel_params: DenseNet pytree mapping [., A] -> [., w_in*w_out]
        ('full') or [., w_in] ('diag').
      root: optional [w_in, w_out] root weight; bias: optional [w_out].
    Returns [N, w_out] float32.
    """
    n = x.shape[0]
    e = senders.shape[0]
    assert aggr in ("mean", "add")
    assert kernel_type in ("full", "diag")

    if impl == "auto":
        impl = _pick_impl(e, in_channels, out_channels, kernel_type,
                          kernel_params)

    if impl == "pallas":
        from .pallas_edge_conv import fused_edge_messages

        msg = fused_edge_messages(
            x, senders, edge_attr, kernel_params,
            in_channels=in_channels, out_channels=out_channels,
            compute_dtype=compute_dtype, sender_sort=sender_sort)
    elif impl == "scan" and kernel_type == "full" and e > chunk_size:
        msg = _scan_messages(x, senders, edge_attr, kernel_params,
                             in_channels, out_channels, chunk_size,
                             compute_dtype)
    else:
        if sender_sort is not None and sender_sort[0] is not None \
                and sender_sort[1] > 0:
            from .segment import gather_rows_st

            x_src = gather_rows_st(x, senders, sender_sort[0],
                                   sender_sort[1])
        else:
            x_src = gather_rows(x, senders)
        msg = _kernel_messages(x_src, edge_attr, kernel_params, in_channels,
                               out_channels, kernel_type, compute_dtype)

    msg = msg.astype(jnp.float32)
    if node_block:
        out = blocked_segment_mean(msg, receivers, edge_mask, n,
                                   node_block, aggr=aggr)
    elif aggr == "mean":
        out = masked_segment_mean(msg, receivers, edge_mask, n,
                                  sorted_span=sorted_span)
    else:
        out = masked_segment_sum(msg, receivers, edge_mask, n,
                                 sorted_span=sorted_span)

    if root is not None:
        out = out + x @ root
    if bias is not None:
        out = out + bias
    return out


def _pick_impl(e, in_channels, out_channels, kernel_type, kernel_params):
    if kernel_type != "full":
        return "reference"
    if jax.default_backend() == "tpu":
        from .pallas_edge_conv import fused_path_supported

        if fused_path_supported(kernel_params, in_channels, out_channels):
            return "pallas"
    elems = e * in_channels * out_channels
    if elems <= _REFERENCE_MAX_KERNEL_ELEMS:
        return "reference"
    return "scan"


def _scan_messages(x, senders, edge_attr, kernel_params, in_channels,
                   out_channels, chunk_size, compute_dtype):
    e = senders.shape[0]
    n_chunks = -(-e // chunk_size)
    e_pad = n_chunks * chunk_size
    if e_pad != e:
        senders = jnp.pad(senders, (0, e_pad - e))
        edge_attr = jnp.pad(edge_attr, ((0, e_pad - e), (0, 0)))
    s = senders.reshape(n_chunks, chunk_size)
    a = edge_attr.reshape(n_chunks, chunk_size, -1)

    def body(args):
        s_c, a_c = args
        return _kernel_messages(gather_rows(x, s_c), a_c, kernel_params, in_channels,
                                out_channels, "full", compute_dtype)

    msg = jax.lax.map(body, (s, a))
    msg = msg.reshape(e_pad, out_channels)
    return msg[:e]


def edge_conv_gaussian(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mask: jnp.ndarray,
    lengthscale_params,
    *,
    aggr: str = "mean",
    root: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NNConv_Gaussian semantics (graph-neural-operator/nn_conv.py:99-194):

    weight_e = (1/sqrt(|attr1 * attr2|)) * exp(-attr0^2 / ell^2), a diagonal
    kernel with learned per-channel lengthscales ell = nn(1).
    """
    n = x.shape[0]
    one = jnp.ones((1, 1), x.dtype)
    ell = dense_apply(lengthscale_params, one).reshape(-1)  # [w]
    a = 1.0 / jnp.sqrt(jnp.abs(edge_attr[:, 1] * edge_attr[:, 2]) + 1e-12)
    b = jnp.exp(-(edge_attr[:, 0:1] ** 2) / (ell[None, :] ** 2))
    weight = a[:, None] * b  # [E, w]
    msg = gather_rows(x, senders) * weight
    if aggr == "mean":
        out = masked_segment_mean(msg, receivers, edge_mask, n)
    else:
        out = masked_segment_sum(msg, receivers, edge_mask, n)
    if root is not None:
        out = out + x @ root
    if bias is not None:
        out = out + bias
    return out


__all__ = ["edge_kernel_conv", "edge_conv_gaussian"]
