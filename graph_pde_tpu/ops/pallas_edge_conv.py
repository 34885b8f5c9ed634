"""Fused Pallas edge-kernel messages.

The reference materializes the per-edge kernel matrices [E, w_in*w_out] in
HBM (nn_conv.py:274: `self.nn(pseudo).view(-1, in, out)`), then reads them
back for the batched matvec — at GKN scales that is gigabytes of HBM
traffic per conv and the measured bottleneck on TPU. These kernels fuse

    h = kappa_MLP(edge_attr)                      (MXU GEMMs, VMEM-resident)
    msg[e,o] = sum_i x_src[e,i] * h[e, i*w_out+o] (selector GEMMs)

so the [E, w_in*w_out] array never exists in HBM; only [E, w_out] messages
are written — a w_in-fold traffic reduction on the dominant array.

Mosaic cannot reshape [blk, w_in*w_out] -> [blk, w_in, w_out] ("unsupported
shape cast"), so the contraction is expressed with binary selector
matrices built from iota:
    Xrep = x @ P           P[i, c]  = (c // w_out == i)   (x broadcast)
    msg  = (K * Xrep) @ QT QT[c, o] = (c %  w_out == o)   (strided sum)

The LAST MLP layer (the [ker_width, w_in*w_out] GEMM, >90% of FLOPs and
bytes) is streamed in column chunks of size C_CHUNK: the forward grid is
(E_blocks, n_chunks) with messages accumulated across chunks and the small
layers' activations held in scratch; the backward runs a second kernel on
the transposed grid (n_chunks, E_blocks) accumulating dW chunks across
edge blocks and emitting per-chunk dx / dh slabs that XLA sums. Small
layers are recomputed and backpropped in XLA (they are [E, ker_width]-
sized — cheap). This supports every reference kernel width (256..1024+)
with large, MXU-shaped blocks.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_E = 256
C_CHUNK = 1024


def _layer_dims(kernel_params) -> Tuple[Tuple[int, int], ...]:
    return tuple((p["w"].shape[0], p["w"].shape[1]) for p in kernel_params)


def fused_path_supported(kernel_params, in_channels: int,
                         out_channels: int) -> bool:
    dims = _layer_dims(kernel_params)
    c = in_channels * out_channels
    if dims[-1][1] != c:
        return False
    if c % out_channels != 0:
        return False
    # chunking needs the last dim divisible into out-channel-aligned chunks
    chunk = min(C_CHUNK, c)
    if c % chunk != 0 or chunk % out_channels != 0:
        return False
    # streamed last-layer chunk (double-buffered) must fit VMEM
    if dims[-1][0] > 2048:
        return False
    return True


def _sel_p(in_channels, out_channels, c0, chunk, transpose=False):
    """P[i, cc] = ((c0 + cc) // out_channels == i)."""
    if transpose:
        cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, in_channels), 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, in_channels), 1)
    else:
        cc = jax.lax.broadcasted_iota(jnp.int32, (in_channels, chunk), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (in_channels, chunk), 0)
    return ((c0 + cc) // out_channels == rows).astype(jnp.float32)


def _sel_qt(out_channels, chunk):
    """QT[cc, o] = (cc % out_channels == o); chunk is out-aligned so the
    pattern is chunk-offset independent."""
    cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 1)
    return (cc % out_channels == cols).astype(jnp.float32)


def _tile_lanes(g, n):
    """[blk, out] -> [blk, out*n] tiled pattern (lane concat — supported
    by Mosaic, unlike reshapes)."""
    if n == 1:
        return g
    return jnp.concatenate([g] * n, axis=1)


def _small_forward(attr, wb_small, n_small):
    h = attr
    for l in range(n_small):
        h = jnp.dot(h, wb_small[2 * l][:],
                    preferred_element_type=jnp.float32) + wb_small[2 * l + 1][:]
        h = jnp.maximum(h, 0.0)  # small layers are always followed by relu
    return h


# --------------------------------------------------------------- forward

def _fwd_kernel(in_channels, out_channels, n_small, chunk, *refs):
    # inputs: x, attr, small wb..., wL_chunk, bL_chunk ; out: msg ; scratch: h
    x_ref, a_ref = refs[0], refs[1]
    wb_small = refs[2: 2 + 2 * n_small]
    wl_ref = refs[2 + 2 * n_small]
    bl_ref = refs[3 + 2 * n_small]
    msg_ref = refs[4 + 2 * n_small]
    h_scr = refs[5 + 2 * n_small]

    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        h_scr[:] = _small_forward(a_ref[:], wb_small, n_small)
        msg_ref[:] = jnp.zeros_like(msg_ref)

    h3c = jnp.dot(h_scr[:], wl_ref[:],
                  preferred_element_type=jnp.float32) + bl_ref[:]
    c0 = ci * chunk
    xrep = jnp.dot(x_ref[:], _sel_p(in_channels, out_channels, c0, chunk),
                   preferred_element_type=jnp.float32)
    msg_ref[:] += jnp.dot(h3c * xrep, _sel_qt(out_channels, chunk),
                          preferred_element_type=jnp.float32)


# --------------------------------------------------- backward (big layer)

def _bwd_big_kernel(in_channels, out_channels, chunk, *refs):
    # inputs: h2, x, g, wL_chunk ; outputs: dwL_chunk, dbL_chunk,
    # dx_slab, dh_slab
    h2_ref, x_ref, g_ref, wl_ref = refs[:4]
    dwl_ref, dbl_ref, dx_ref, dh_ref = refs[4:]

    ei = pl.program_id(1)
    ci = pl.program_id(0)
    c0 = ci * chunk

    g = g_ref[:]
    grep = _tile_lanes(g, chunk // out_channels)
    xrep = jnp.dot(x_ref[:], _sel_p(in_channels, out_channels, c0, chunk),
                   preferred_element_type=jnp.float32)
    dpre = xrep * grep

    h2 = h2_ref[:]
    h3c = jnp.dot(h2, wl_ref[:], preferred_element_type=jnp.float32)
    # note: + bL does not matter for the grads computed here except dx,
    # where K includes the bias contribution -> add it
    dx_ref[0] = jnp.dot(
        (h3c * grep), _sel_p(in_channels, out_channels, c0, chunk,
                             transpose=True),
        preferred_element_type=jnp.float32)
    dh_ref[0] = jax.lax.dot_general(
        dpre, wl_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dwl = jax.lax.dot_general(h2, dpre, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbl = jnp.sum(dpre, axis=0, keepdims=True)

    @pl.when(ei == 0)
    def _():
        dwl_ref[:] = dwl
        dbl_ref[:] = dbl

    @pl.when(ei != 0)
    def _():
        dwl_ref[:] += dwl
        dbl_ref[:] += dbl


def _pad_e(arr, e_pad):
    e = arr.shape[0]
    if e == e_pad:
        return arr
    pad = [(0, e_pad - e)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


@functools.lru_cache(maxsize=64)
def _get_fused_fn(layer_dims, in_channels, out_channels, block_e,
                  interpret):
    n_layers = len(layer_dims)
    n_small = n_layers - 1
    a_dim = layer_dims[0][0]
    kw_last = layer_dims[-1][0]
    c_total = layer_dims[-1][1]
    chunk = min(C_CHUNK, c_total)
    n_chunks = c_total // chunk

    def const_spec(i, o):
        return pl.BlockSpec((i, o), lambda e, c: (0, 0),
                            memory_space=pltpu.VMEM)

    def small_weight_specs():
        specs = []
        for (i, o) in layer_dims[:-1]:
            specs.append(const_spec(i, o))
            specs.append(const_spec(1, o))
        return specs

    def fwd_impl(x_src, attr, flat):
        e = x_src.shape[0]
        e_pad = ((e + block_e - 1) // block_e) * block_e
        xs = _pad_e(x_src, e_pad)
        at = _pad_e(attr, e_pad)
        grid = (e_pad // block_e, n_chunks)
        kernel = functools.partial(_fwd_kernel, in_channels, out_channels,
                                   n_small, chunk)
        edge = lambda w: pl.BlockSpec((block_e, w), lambda ei, ci: (ei, 0),
                                      memory_space=pltpu.VMEM)
        wl_spec = pl.BlockSpec((kw_last, chunk), lambda ei, ci: (0, ci),
                               memory_space=pltpu.VMEM)
        bl_spec = pl.BlockSpec((1, chunk), lambda ei, ci: (0, ci),
                               memory_space=pltpu.VMEM)
        msg = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[edge(in_channels), edge(a_dim)]
            + small_weight_specs() + [wl_spec, bl_spec],
            out_specs=edge(out_channels),
            out_shape=jax.ShapeDtypeStruct((e_pad, out_channels),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_e, kw_last), jnp.float32)],
            interpret=interpret,
        )(xs, at, *flat)
        return msg[:e]

    def bwd_big(h2, x_src, g, w_last):
        e = x_src.shape[0]
        e_pad = ((e + block_e - 1) // block_e) * block_e
        h2p = _pad_e(h2, e_pad)
        xs = _pad_e(x_src, e_pad)
        gp = _pad_e(g, e_pad)
        grid = (n_chunks, e_pad // block_e)
        kernel = functools.partial(_bwd_big_kernel, in_channels,
                                   out_channels, chunk)
        edge = lambda w: pl.BlockSpec((block_e, w), lambda ci, ei: (ei, 0),
                                      memory_space=pltpu.VMEM)
        wl_spec = pl.BlockSpec((kw_last, chunk), lambda ci, ei: (0, ci),
                               memory_space=pltpu.VMEM)
        slab = lambda w: pl.BlockSpec((1, block_e, w),
                                      lambda ci, ei: (ci, ei, 0),
                                      memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[edge(kw_last), edge(in_channels), edge(out_channels),
                      wl_spec],
            out_specs=[
                pl.BlockSpec((kw_last, chunk), lambda ci, ei: (0, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda ci, ei: (0, ci),
                             memory_space=pltpu.VMEM),
                slab(in_channels),
                slab(kw_last),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kw_last, c_total), jnp.float32),
                jax.ShapeDtypeStruct((1, c_total), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, e_pad, in_channels),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, e_pad, kw_last),
                                     jnp.float32),
            ],
            interpret=interpret,
        )(h2p, xs, gp, w_last)
        dwl, dbl, dx_slab, dh_slab = outs
        dx = jnp.sum(dx_slab, axis=0)[:e]
        dh2 = jnp.sum(dh_slab, axis=0)[:e]
        return dwl, dbl, dx, dh2

    def small_forward_xla(attr, flat):
        hs = [attr]
        h = attr
        for l in range(n_small):
            h = h @ flat[2 * l] + flat[2 * l + 1]
            h = jnp.maximum(h, 0.0)
            hs.append(h)
        return hs

    @jax.custom_vjp
    def fused(x_src, attr, flat):
        return fwd_impl(x_src, attr, flat)

    def fused_fwd(x_src, attr, flat):
        return fwd_impl(x_src, attr, flat), (x_src, attr, flat)

    def fused_bwd(res, g):
        x_src, attr, flat = res
        hs = small_forward_xla(attr, flat)
        h2 = hs[-1]
        w_last = flat[2 * n_small]
        dwl, dbl, dx, dh = bwd_big(h2, x_src, g, w_last)
        # bias of the last layer contributes to K and hence to dx:
        # K = h2 @ W_L + b_L; the kernel computed dx from h2 @ W_L only.
        b_last = flat[2 * n_small + 1]  # [1, c_total]
        # dx_bias[e, i] = sum_o b_L[i*out + o] * g[e, o]
        b_mat = b_last.reshape(in_channels, out_channels)
        dx = dx + g @ b_mat.T
        # backprop small layers in XLA
        dflat = [None] * len(flat)
        dflat[2 * n_small] = dwl
        dflat[2 * n_small + 1] = dbl
        dcur = dh
        for l in reversed(range(n_small)):
            dpre = dcur * (hs[l + 1] > 0.0)
            dflat[2 * l] = hs[l].T @ dpre
            dflat[2 * l + 1] = jnp.sum(dpre, axis=0, keepdims=True)
            dcur = dpre @ flat[2 * l].T
        da = dcur
        return dx, da, tuple(dflat)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def _flatten_params(kernel_params):
    flat = []
    for p in kernel_params:
        flat.append(p["w"])
        flat.append(p["b"].reshape(1, -1))
    return flat


def fused_edge_messages(x, senders, edge_attr, kernel_params, *,
                        in_channels: int, out_channels: int,
                        compute_dtype=None, block_e=None,
                        interpret: bool = False):
    """[E, w_out] messages x_src @ kappa(attr), fused (no [E, w_in*w_out]
    HBM round-trip). compute_dtype is currently ignored (f32 kernels)."""
    assert fused_path_supported(kernel_params, in_channels, out_channels), \
        "fused path unsupported for this kernel shape; use impl='scan'"
    dims = _layer_dims(kernel_params)
    if block_e is None:
        block_e = DEFAULT_BLOCK_E
    fused = _get_fused_fn(dims, in_channels, out_channels, block_e,
                          interpret)
    flat = tuple(_flatten_params(kernel_params))
    x_src = x[senders]
    return fused(x_src, edge_attr, flat)


__all__ = ["fused_edge_messages", "fused_path_supported",
           "DEFAULT_BLOCK_E", "C_CHUNK"]
