"""Fused kcached iteration: per-edge contraction + block-local
aggregation in ONE pallas kernel.

The kcached depth iteration (models/gkn.py) at full-grid scale runs
three XLA stages per iteration — gather x[senders], contract against
the cached K, block-local one-hot segment reduce (the reference's
nn_conv.py:273-275 loop body, restructured) — and each stage round-trips
an [E, w] intermediate through HBM, plus the aggregation rebuilds and
materializes the [E, span] one-hot every iteration. Measured on the
v5e at UAI1 full-grid scale (E=383k, w=64, bf16 K): contract 6.35 ms +
blockoh 3.13 ms per iteration, against a ~6.3 ms K-stream floor.

This op fuses contract + aggregate: the kernel streams K once, keeps
the per-block messages in VMEM scratch, and reduces them onto the
block-local one-hot before anything leaves the chip — the [E, w]
message array never exists in HBM. Structure notes:

- The masked one-hot OH[e, s] = (recv_local[e] == s) * mask[e] is
  ITERATION-INVARIANT (receivers/mask don't change across the depth
  loop), so it is built once per forward in XLA and streamed as a
  [E, span] operand (span=64: a 1/64 side stream next to K's [E, w^2]).
- The contraction uses the proven selector-GEMM form (Mosaic cannot
  reshape [blk, w_in*w_out] -> [blk, w_in, w_out]; see
  ops/cached_contraction.py).
- The custom_vjp backward is ONE kernel emitting dxj and dmsg; dK is
  left to XLA as outer(xj, dmsg) so the unrolled depth loop's T dK
  contributions still fuse into a single [E, w^2] write (a pallas
  dK-per-iteration backward measurably regressed — PERF_NOTES.md).
- Optional fp8 storage: pass k8 = K.astype(float8) and both kernels
  stream 1 byte/elem from HBM, upcasting in VMEM; the dK cotangent
  still flows to the bf16/f32 K argument (straight-through estimator
  with the quantized values used for the dxj linearization).

Output is the per-block partial sums [nb, span, w]; the (cheap,
differentiable) final combine — scatter nb*span partial rows onto the
node array and divide by counts — stays in XLA (fused_iterate_total).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cached_contraction import _sel_p, _sel_qt, _tile_lanes

BLOCK_E = 512   # must match ops/segment._SORTED_BLOCK_EB (span bound)
C_CHUNK = 1024


def fused_iterate_supported(e: int, in_channels: int, out_channels: int,
                            span: int) -> bool:
    c = in_channels * out_channels
    chunk = min(C_CHUNK, c)
    return (e > 0 and e % BLOCK_E == 0 and span > 0
            and c % chunk == 0 and chunk % out_channels == 0)


def _fwd_kernel(in_channels, out_channels, chunk, n_chunks, *refs):
    xj_ref, k_ref, oh_ref, part_ref, msg_scr = refs
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        msg_scr[:] = jnp.zeros_like(msg_scr)

    xrep = jnp.dot(xj_ref[:].astype(jnp.float32),
                   _sel_p(in_channels, out_channels, ci * chunk, chunk),
                   preferred_element_type=jnp.float32)
    kc = k_ref[:].astype(jnp.float32)
    msg_scr[:] += jnp.dot(kc * xrep, _sel_qt(out_channels, chunk),
                          preferred_element_type=jnp.float32)

    @pl.when(ci == n_chunks - 1)
    def _():
        # part[s, o] = sum_e OH[e, s] * msg[e, o]  (mask is inside OH)
        part_ref[0] = jax.lax.dot_general(
            oh_ref[:].astype(jnp.float32), msg_scr[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_kernel(in_channels, out_channels, chunk, *refs):
    k_ref, oh_ref, dpart_ref, dxj_ref, dmsg_ref, dmsg_scr = refs
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        # dmsg[e, o] = sum_s OH[e, s] * dpart[s, o]
        dmsg_scr[:] = jnp.dot(oh_ref[:].astype(jnp.float32), dpart_ref[0],
                              preferred_element_type=jnp.float32)
        dmsg_ref[:] = dmsg_scr[:]
        dxj_ref[:] = jnp.zeros_like(dxj_ref)

    grep = _tile_lanes(dmsg_scr[:], chunk // out_channels)
    kc = k_ref[:].astype(jnp.float32)
    dxj_ref[:] += jnp.dot(kc * grep,
                          _sel_p(in_channels, out_channels, ci * chunk,
                                 chunk, transpose=True),
                          preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=64)
def _get_fn(in_channels, out_channels, span, k_dtype_name, use_k8,
            interpret):
    c_total = in_channels * out_channels
    chunk = min(C_CHUNK, c_total)
    n_chunks = c_total // chunk

    def edge_spec(width):
        return pl.BlockSpec((BLOCK_E, width), lambda ei, ci: (ei, 0),
                            memory_space=pltpu.VMEM)

    def k_spec():
        return pl.BlockSpec((BLOCK_E, chunk), lambda ei, ci: (ei, ci),
                            memory_space=pltpu.VMEM)

    def part_spec():
        return pl.BlockSpec((1, span, out_channels),
                            lambda ei, ci: (ei, 0, 0),
                            memory_space=pltpu.VMEM)

    def fwd_impl(xj, k_stream, oh):
        e = xj.shape[0]
        nb = e // BLOCK_E
        return pl.pallas_call(
            functools.partial(_fwd_kernel, in_channels, out_channels,
                              chunk, n_chunks),
            grid=(nb, n_chunks),
            in_specs=[edge_spec(in_channels), k_spec(), edge_spec(span)],
            out_specs=part_spec(),
            out_shape=jax.ShapeDtypeStruct((nb, span, out_channels),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((BLOCK_E, out_channels),
                                       jnp.float32)],
            interpret=interpret,
        )(xj, k_stream, oh)

    def bwd_impl(k_stream, oh, dpart):
        e = k_stream.shape[0]
        nb = e // BLOCK_E
        dxj, dmsg = pl.pallas_call(
            functools.partial(_bwd_kernel, in_channels, out_channels,
                              chunk),
            grid=(nb, n_chunks),
            in_specs=[k_spec(), edge_spec(span), part_spec()],
            out_specs=[edge_spec(in_channels), edge_spec(out_channels)],
            out_shape=[
                jax.ShapeDtypeStruct((e, in_channels), jnp.float32),
                jax.ShapeDtypeStruct((e, out_channels), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((BLOCK_E, out_channels),
                                       jnp.float32)],
            interpret=interpret,
        )(k_stream, oh, dpart)
        return dxj, dmsg

    if use_k8:
        @jax.custom_vjp
        def fused(xj, K, oh, k8):
            return fwd_impl(xj, k8, oh)

        def fused_fwd(xj, K, oh, k8):
            return fwd_impl(xj, k8, oh), (xj, k8, oh)

        def fused_bwd(res, dpart):
            xj, k8, oh = res
            dxj, dmsg = bwd_impl(k8, oh, dpart)
            # dK in XLA: the unrolled depth loop's T contributions fuse
            # into one [E, c] write (see module docstring). STE: the
            # cotangent lands on the full-precision K argument.
            dk = (xj[:, :, None].astype(jnp.float32)
                  * dmsg[:, None, :]).reshape(xj.shape[0], c_total)
            k_dtype = (jnp.bfloat16 if k_dtype_name == "bfloat16"
                       else jnp.float32)
            return (dxj.astype(xj.dtype), dk.astype(k_dtype),
                    jnp.zeros_like(oh), jnp.zeros_like(k8))

        fused.defvjp(fused_fwd, fused_bwd)
        return fused

    @jax.custom_vjp
    def fused(xj, K, oh):
        return fwd_impl(xj, K, oh)

    def fused_fwd(xj, K, oh):
        return fwd_impl(xj, K, oh), (xj, K, oh)

    def fused_bwd(res, dpart):
        xj, K, oh = res
        dxj, dmsg = bwd_impl(K, oh, dpart)
        dk = (xj[:, :, None].astype(jnp.float32)
              * dmsg[:, None, :]).reshape(xj.shape[0], c_total)
        return (dxj.astype(xj.dtype), dk.astype(K.dtype),
                jnp.zeros_like(oh))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def sorted_iterate_setup(receivers, mask, num_segments: int, span: int,
                         dtype=jnp.bfloat16):
    """Once-per-forward (iteration-invariant) aggregation operands for
    fused_iterate_total: the masked block-local one-hot OH [E, span],
    the partial-row target ids [nb*span], and the clamped per-node
    valid-edge counts [N, 1] (PyG scatter_mean divisor semantics,
    nn_conv.py via torch_scatter)."""
    e = receivers.shape[0]
    nb = e // BLOCK_E
    rb = receivers.reshape(nb, BLOCK_E)
    base = rb[:, 0]
    local = rb - base[:, None]           # in [0, span) (host-verified)
    seg = jax.lax.broadcasted_iota(jnp.int32, (nb, BLOCK_E, span), 2)
    oh = ((local[:, :, None] == seg)
          & mask.reshape(nb, BLOCK_E)[:, :, None]).astype(dtype)
    oh = oh.reshape(e, span)
    ids = (base[:, None]
           + jnp.arange(span, dtype=receivers.dtype)[None]).reshape(-1)
    counts = jax.ops.segment_sum(
        mask.astype(jnp.float32), receivers, num_segments=num_segments,
        indices_are_sorted=True)
    counts = jnp.maximum(counts, 1.0)[:, None]
    return oh, ids, counts


def fused_iterate_total(xj, K, oh, ids, num_segments: int, span: int, *,
                        in_channels: int, out_channels: int, k8=None,
                        interpret=None):
    """Masked per-node message SUM for one kcached iteration:
    total[n] = sum_{e: recv[e]=n, mask[e]} xj[e] @ K[e].reshape(in, out).

    Mean aggregation = total * (1/counts) at the caller (counts are
    iteration-invariant, from sorted_iterate_setup).

    interpret=None: compiled on TPU, pallas interpreter elsewhere (the
    CPU test mesh / driver dryrun run the same code path, interpreted).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_dtype_name = "bfloat16" if K.dtype == jnp.bfloat16 else "float32"
    fn = _get_fn(in_channels, out_channels, span, k_dtype_name,
                 k8 is not None, interpret)
    part = fn(xj, K, oh, k8) if k8 is not None else fn(xj, K, oh)
    # nb*span partial rows (~E/8 at span=64): the scatter cost scales
    # with rows, and this segment_sum is differentiable XLA — its
    # backward is a cheap [nb*span, w] row gather feeding _bwd_kernel.
    total = jax.ops.segment_sum(
        part.reshape(-1, out_channels), ids,
        num_segments=num_segments + span)
    return total[:num_segments]


__all__ = ["fused_iterate_total", "sorted_iterate_setup",
           "fused_iterate_supported", "BLOCK_E"]
