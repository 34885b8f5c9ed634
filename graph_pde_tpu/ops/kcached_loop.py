"""Depth-loop-level custom VJP for the kcached execution mode.

The kcached GKN forward (models/gkn.py) runs the depth-T Picard
iteration against kernel matrices K = kappa(edge_attr) computed once per
forward (the reference recomputes nn(pseudo) inside every conv call,
graph-neural-operator/nn_conv.py:273-275). Under plain autodiff each
iteration's backward materializes its own dK_t = x_t (x) g_t chunk of
[E, w^2] in HBM and XLA accumulates them — at full-grid edge counts
(UAI1: E~418k, w=64 => 3.4 GB bf16 per chunk) the per-iteration dK
write traffic rivals the two unavoidable K reads (forward contraction +
backward dx) and the step is HBM-bound (PERF_NOTES.md round-2 section).

This module differentiates the WHOLE depth loop as one custom_vjp:

  forward : per iteration — gather, broadcast-reduce contraction
            against K, masked segment mean/sum, root/bias, ReLU.
            Residuals: the T iteration inputs [T, N, w] (node-sized,
            ~1/E-th of K) and the final output (for the last ReLU mask).
  backward: per iteration (reverse) — ReLU mask, bias/root cotangents,
            mean-backward scaling, gather-to-edges of the output
            cotangent, dx via the transposed contraction (the second,
            unavoidable K read), scatter-add to senders. The per-edge
            cotangents g_t ([E, w], small) are STACKED, and

                dK[e] = sum_t x_t[senders[e]] (x) g_t[e]

            is materialized ONCE at the end as a single batched
            contraction over t — T dK writes become one.

OUTCOME (measured, scripts/time_uai1_step.py on the v5e): 231.4 ms vs
plain-autodiff 204.9 ms per UAI1 full-grid step — a 13% REGRESSION, so
`GKNConfig.loop_vjp` defaults to False. Root cause: the depth loop is
unrolled under jit, so all T per-edge cotangents are visible to one XLA
fusion and XLA's own transpose already materializes dK = sum_t
outer(xj_t, g_t) as a single fused [E, w^2] write — the premise that
plain autodiff writes dK per iteration was wrong. The hand VJP only
adds the [T, E, w] stack transposes and a tiny-inner-dim (T=6) batched
GEMM the MXU tiles poorly. Kept as a tested building block (parity +
grad tests in tests/test_models.py); it would only pay off if the depth
loop ever moves into lax.scan (where per-iteration residual/cotangent
materialization IS real).

Supported: kernel_type='full', node_block=0 (flat receiver-sorted edge
lists), aggr in {mean, add}, optional root/bias, f32 or bf16 K. The
blocked-CSR layout keeps the plain-autodiff path (models/gkn.py gates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .segment import (_use_onehot, gather_rows, masked_segment_mean,
                      masked_segment_sum, segment_sum)


def _contract(xj, kk3, width):
    """msg[e, o] = sum_i K3[e, i, o] * xj[e, i] — broadcast-reduce form
    (the only formulation that reaches the bf16 HBM streaming floor on
    the v5e; PERF_NOTES.md contraction shootout)."""
    return jnp.sum(kk3 * xj.astype(kk3.dtype)[:, :, None], axis=1,
                   dtype=jnp.float32)


def _contract_t(gmsg, kk3, width):
    """dxj[e, i] = sum_o K3[e, i, o] * gmsg[e, o] (transposed)."""
    return jnp.sum(kk3 * gmsg.astype(kk3.dtype)[:, None, :], axis=2,
                   dtype=jnp.float32)


@functools.lru_cache(maxsize=64)
def _get_loop(depth, width, aggr, relu_last, has_root, has_bias,
              sorted_span):
    def iterate(x, kk3, root, bias, senders, receivers, edge_mask):
        n = x.shape[0]
        xj = gather_rows(x, senders)
        msg = _contract(xj, kk3, width)
        if aggr == "mean":
            out = masked_segment_mean(msg, receivers, edge_mask, n,
                                      sorted_span=sorted_span)
        else:
            out = masked_segment_sum(msg, receivers, edge_mask, n,
                                     sorted_span=sorted_span)
        if has_root:
            out = out + x @ root
        if has_bias:
            out = out + bias
        return out

    @jax.custom_vjp
    def loop(x, kk, root, bias, senders, receivers, edge_mask):
        e = senders.shape[0]
        kk3 = kk.reshape(e, width, width)
        for t in range(depth):
            x = iterate(x, kk3, root, bias, senders, receivers, edge_mask)
            if t != depth - 1 or relu_last:
                x = jax.nn.relu(x)
        return x

    def loop_fwd(x, kk, root, bias, senders, receivers, edge_mask):
        e = senders.shape[0]
        kk3 = kk.reshape(e, width, width)
        xs = []
        for t in range(depth):
            xs.append(x)
            x = iterate(x, kk3, root, bias, senders, receivers, edge_mask)
            if t != depth - 1 or relu_last:
                x = jax.nn.relu(x)
        res = (jnp.stack(xs), x, kk, root, senders, receivers, edge_mask)
        return x, res

    def loop_bwd(res, g):
        xs, y, kk, root, senders, receivers, edge_mask = res
        e = senders.shape[0]
        n = xs.shape[1]
        kk3 = kk.reshape(e, width, width)
        sorted_r = True  # receiver-sorted edge lists (graph/graph.py)
        if aggr == "mean":
            counts = segment_sum(edge_mask.astype(jnp.float32), receivers,
                                 n, indices_are_sorted=sorted_r)
            inv = 1.0 / jnp.maximum(counts, 1.0)
        mask_f = edge_mask.astype(jnp.float32)[:, None]
        gmsgs = [None] * depth
        droot = jnp.zeros_like(root) if has_root else None
        dbias = jnp.zeros((width,), jnp.float32) if has_bias else None
        for t in reversed(range(depth)):
            if t != depth - 1 or relu_last:
                x_out = y if t == depth - 1 else xs[t + 1]
                g = g * (x_out > 0)
            x_in = xs[t]
            if has_bias:
                dbias = dbias + g.sum(axis=0)
            if has_root:
                droot = droot + x_in.T @ g
                g_root = g @ root.T
            g_scaled = g * inv[:, None] if aggr == "mean" else g
            gmsg = gather_rows(g_scaled, receivers) * mask_f
            gmsgs[t] = gmsg
            dxj = _contract_t(gmsg, kk3, width)
            # scatter-add to senders (NOT receiver-sorted): one-hot MXU
            # matmul when small enough, XLA scatter otherwise — the same
            # gate the forward gather's own transpose would take.
            if _use_onehot(e, n):
                g = segment_sum(dxj, senders, n, indices_are_sorted=False,
                                method="onehot")
            else:
                g = jax.ops.segment_sum(dxj, senders, num_segments=n,
                                        indices_are_sorted=False)
            if has_root:
                g = g + g_root
        # dK materialized ONCE: batched contraction over the depth axis.
        # Operands are [E, T, w] — ~T/w of K's size — so this is one
        # [E, w^2] write instead of T writes + accumulation traffic.
        xj_stack = jax.vmap(lambda xt: gather_rows(xt, senders))(xs)
        g_stack = jnp.stack(gmsgs)
        dkk = jax.lax.dot_general(
            jnp.transpose(xj_stack, (1, 0, 2)),
            jnp.transpose(g_stack, (1, 0, 2)),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [E, w, w]
        dkk = dkk.reshape(e, width * width).astype(kk.dtype)
        return (g, dkk, droot if has_root else None,
                dbias if has_bias else None, None, None, None)

    loop.defvjp(loop_fwd, loop_bwd)
    return loop


def kcached_depth_loop(x, kk, root, bias, senders, receivers, edge_mask,
                       *, depth: int, width: int, aggr: str = "mean",
                       relu_last: bool = True, sorted_span: int = 0):
    """Depth-T kcached iteration with the loop-level VJP.

    Args:
      x: [N, w] f32 node features (post-encoder).
      kk: [E, w*w] cached kernel matrices (f32 or bf16).
      root: optional [w, w]; bias: optional [w].
      senders/receivers: [E] int32, receiver-sorted, padding at tail.
      edge_mask: [E] bool validity mask.
    Returns [N, w] f32 (the final iterate, ReLU'd per relu_last).
    """
    fn = _get_loop(depth, width, aggr, relu_last, root is not None,
                   bias is not None, sorted_span)
    return fn(x, kk, root, bias, senders, receivers, edge_mask)


__all__ = ["kcached_depth_loop"]
