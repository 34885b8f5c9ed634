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
and the tiled pattern Grep[e, c] = g[e, c % w_out] via lane concatenation
(Mosaic-supported, unlike reshape).

Three kernel forms, selected by auto gates (fastest first):
  1. o-major resident (default when the last layer fits VMEM): Wl
     columns permuted once per call so both replication patterns are
     free VPU ops — no selector GEMMs at all (see the o-major section).
  2. i-major resident: Wl held in VMEM, single parallel E grid,
     unrolled in-kernel chunk loop.
  3. i-major streamed (large ker_width fallback): the last MLP layer
     ([ker_width, w_in*w_out], >90% of FLOPs and bytes) streamed in
     column chunks over a second grid axis; the backward splits into a
     dx/dh kernel (grid (E_blocks, n_chunks)) and a dW/db kernel
     (grid (n_chunks, E_blocks)) accumulating on opposite grid orders.
Small layers are recomputed and backpropped in XLA (they are
[E, ker_width]-sized — cheap). This supports every reference kernel width
(256..1024+) with large, MXU-shaped blocks.

compute_dtype='bfloat16' casts GEMM operands to bf16 (f32 accumulation via
preferred_element_type) — the same precision XLA's default TPU matmul
already uses, but with halved VMEM/VPU traffic inside the kernels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_E = 512
C_CHUNK = 1024


def _layer_dims(kernel_params) -> Tuple[Tuple[int, int], ...]:
    return tuple((p["w"].shape[0], p["w"].shape[1]) for p in kernel_params)


def fused_path_supported(kernel_params, in_channels: int,
                         out_channels: int) -> bool:
    dims = _layer_dims(kernel_params)
    c = in_channels * out_channels
    if dims[-1][1] != c:
        return False
    chunk = min(C_CHUNK, c)
    if c % chunk != 0 or chunk % out_channels != 0:
        return False
    # streamed last-layer chunk (double-buffered) must fit VMEM
    if dims[-1][0] > 2048:
        return False
    return True


def _sel_p(in_channels, out_channels, c0, chunk, dtype,
           transpose=False):
    """P[i, cc] = ((c0 + cc) // out_channels == i)."""
    if transpose:
        cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, in_channels), 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, in_channels), 1)
    else:
        cc = jax.lax.broadcasted_iota(jnp.int32, (in_channels, chunk), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (in_channels, chunk), 0)
    return ((c0 + cc) // out_channels == rows).astype(dtype)


def _sel_qt(out_channels, chunk, dtype):
    """QT[cc, o] = (cc % out_channels == o); chunks are out-aligned so the
    pattern is chunk-offset independent."""
    cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 1)
    return (cc % out_channels == cols).astype(dtype)


def _tile_lanes(g, n):
    """[blk, out] -> [blk, out*n] tiled pattern via lane concat."""
    if n == 1:
        return g
    return jnp.concatenate([g] * n, axis=1)


def _dot(a, b, dtype):
    if dtype is not None:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_general(a, b, dims, dtype):
    if dtype is not None:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _small_forward(attr, wb_small, n_small, dtype):
    h = attr
    for l in range(n_small):
        h = _dot(h, wb_small[2 * l][:], dtype) + wb_small[2 * l + 1][:]
        h = jnp.maximum(h, 0.0)
    return h


# --------------------------------------------------------------- forward

def _fwd_kernel(in_channels, out_channels, n_small, chunk, dtype, *refs):
    x_ref, a_ref = refs[0], refs[1]
    wb_small = refs[2: 2 + 2 * n_small]
    wl_ref = refs[2 + 2 * n_small]
    bl_ref = refs[3 + 2 * n_small]
    msg_ref = refs[4 + 2 * n_small]
    h_scr = refs[5 + 2 * n_small]

    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        h_scr[:] = _small_forward(a_ref[:], wb_small, n_small, dtype)
        msg_ref[:] = jnp.zeros_like(msg_ref)

    h3c = _dot(h_scr[:], wl_ref[:], dtype) + bl_ref[:]
    c0 = ci * chunk
    sel_dtype = dtype or jnp.float32
    xrep = _dot(x_ref[:], _sel_p(in_channels, out_channels, c0, chunk,
                                 sel_dtype), dtype)
    msg_ref[:] += _dot(h3c * xrep, _sel_qt(out_channels, chunk, sel_dtype),
                       dtype)


# -------------------------------- Wl-resident variants (single E grid)
#
# When the whole last-layer weight fits VMEM (kw_last * c_total at the
# compute dtype — e.g. [256, 4096] bf16 = 2 MB), streaming it in column
# chunks across a second grid axis is pure overhead: the same chunk is
# re-fetched for every edge block (grid order (ei, ci) re-DMAs ~n_chunks
# * E/block_e * chunk_bytes per conv) and the revisited accumulator
# output adds per-step bookkeeping. These variants keep Wl resident
# (constant index_map -> fetched once), iterate chunks in an unrolled
# in-kernel loop, and run a single parallel E grid axis. Measured at
# E=1.2M, kw=256, c=4096 (scripts/fused_tune.py, v5e): fwd 33.4 ->
# 32.3 ms, fwd+bwd 135.5 -> 131.4 ms (PERF_NOTES round 3).

def _fwd_kernel_res(in_channels, out_channels, n_small, chunk, n_chunks,
                    dtype, *refs):
    x_ref, a_ref = refs[0], refs[1]
    wb_small = refs[2: 2 + 2 * n_small]
    wl_ref = refs[2 + 2 * n_small]
    bl_ref = refs[3 + 2 * n_small]
    msg_ref = refs[4 + 2 * n_small]

    h = _small_forward(a_ref[:], wb_small, n_small, dtype)
    sel_dtype = dtype or jnp.float32
    qt = _sel_qt(out_channels, chunk, sel_dtype)
    acc = jnp.zeros_like(msg_ref)
    for ci in range(n_chunks):
        c0 = ci * chunk
        h3c = _dot(h, wl_ref[:, c0: c0 + chunk], dtype) \
            + bl_ref[:, c0: c0 + chunk]
        xrep = _dot(x_ref[:], _sel_p(in_channels, out_channels, c0,
                                     chunk, sel_dtype), dtype)
        acc += _dot(h3c * xrep, qt, dtype)
    msg_ref[:] = acc


def _bwd_dx_kernel_res(in_channels, out_channels, chunk, n_chunks,
                       dtype, *refs):
    h2_ref, x_ref, g_ref, wl_ref = refs[:4]
    dx_ref, dh_ref = refs[4:]

    sel_dtype = dtype or jnp.float32
    g = g_ref[:]
    grep = _tile_lanes(g, chunk // out_channels)
    dx = jnp.zeros_like(dx_ref)
    dh = jnp.zeros_like(dh_ref)
    for ci in range(n_chunks):
        c0 = ci * chunk
        wl_c = wl_ref[:, c0: c0 + chunk]
        h3c = _dot(h2_ref[:], wl_c, dtype)
        dx += _dot(h3c * grep,
                   _sel_p(in_channels, out_channels, c0, chunk,
                          sel_dtype, transpose=True), dtype)
        xrep = _dot(x_ref[:], _sel_p(in_channels, out_channels, c0,
                                     chunk, sel_dtype), dtype)
        dh += _dot_general(xrep * grep, wl_c, (((1,), (1,)), ((), ())),
                           dtype)
    dx_ref[:] = dx
    dh_ref[:] = dh


def _bwd_dw_kernel_res(in_channels, out_channels, chunk, n_chunks,
                       dtype, *refs):
    h2_ref, x_ref, g_ref = refs[:3]
    dwl_ref, dbl_ref = refs[3:]

    ei = pl.program_id(0)
    sel_dtype = dtype or jnp.float32
    g = g_ref[:]
    grep = _tile_lanes(g, chunk // out_channels)

    @pl.when(ei == 0)
    def _():
        dwl_ref[:] = jnp.zeros_like(dwl_ref)
        dbl_ref[:] = jnp.zeros_like(dbl_ref)

    for ci in range(n_chunks):
        c0 = ci * chunk
        xrep = _dot(x_ref[:], _sel_p(in_channels, out_channels, c0,
                                     chunk, sel_dtype), dtype)
        dpre = xrep * grep
        dwl_ref[:, c0: c0 + chunk] += _dot_general(
            h2_ref[:], dpre, (((0,), (0,)), ((), ())), dtype)
        dbl_ref[:, c0: c0 + chunk] += jnp.sum(dpre, axis=0,
                                              keepdims=True)


# ----------------------------- o-major layout variants (single E grid)
#
# i-major (reference layout, nn_conv.py:274 view(-1, in, out)): column
# c = i*out + o. The contraction then needs TWO selector GEMMs per
# direction (Xrep interleave + QT strided-sum fwd; their transposes
# bwd), each contracting over only w=64 rows — half-rate on the
# 128-wide MXU and ~38% of the kernels' MXU cycles.
#
# o-major: permute Wl/bl columns ONCE per call in XLA (cheap [kw, c]
# gather) so column c' = o*in + i. Then within an in-aligned chunk:
#   Xrep' = tile(x)                  (free lane concat, no GEMM)
#   Grep' = per-o lane broadcasts    (free VPU, no GEMM)
#   msg   = (h3c' * Xrep') @ QTo     (QTo[cc,o] = ((c0+cc)//in == o))
#   dx   += contiguous in-wide slice adds of h3c' * Grep'  (VPU)
# MXU cycles per chunk column drop from ~1664 to ~1152 (fwd 512->384,
# bwd-dx 768->512, bwd-dw 384->256, in B*chunk units with kw=256,
# w=64); every surviving GEMM contracts over >=chunk or kw depth.
# Weight grads come back o-major and are un-permuted in XLA.

def _omajor_perm(in_channels, out_channels):
    """perm[c'] = source column of o-major column c' (= i*out + o)."""
    c = in_channels * out_channels
    cp = np.arange(c)
    return (cp % in_channels) * out_channels + cp // in_channels


def _interleave_bcast(g, o0, noc, in_channels):
    """[blk, out] -> [blk, noc*in]: column o0+oo broadcast in-wide."""
    parts = [jnp.broadcast_to(g[:, o0 + oo: o0 + oo + 1],
                              (g.shape[0], in_channels))
             for oo in range(noc)]
    return parts[0] if noc == 1 else jnp.concatenate(parts, axis=1)


def _sel_qt_omj(in_channels, out_channels, c0, chunk, dtype):
    """QTo[cc, o] = ((c0 + cc) // in_channels == o)."""
    cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 1)
    return ((c0 + cc) // in_channels == cols).astype(dtype)


def _fwd_kernel_omj(in_channels, out_channels, n_small, chunk, n_chunks,
                    dtype, qt_slices, *refs):
    x_ref, a_ref = refs[0], refs[1]
    wb_small = refs[2: 2 + 2 * n_small]
    wl_ref = refs[2 + 2 * n_small]
    bl_ref = refs[3 + 2 * n_small]
    msg_ref = refs[4 + 2 * n_small]

    h = _small_forward(a_ref[:], wb_small, n_small, dtype)
    sel_dtype = dtype or jnp.float32
    noc = chunk // in_channels
    xrep = _tile_lanes(x_ref[:], noc)
    if dtype is not None:
        xrep = xrep.astype(dtype)
    if qt_slices:
        # MFU probe (round-4): the QTo GEMM contracts chunk-deep but
        # emits only out_channels lanes (half-rate on the 128-wide
        # MXU, ~1/3 of kernel MXU cycles). This form replaces it with
        # VPU cross-lane slice sums: msg[:, o] = sum_i v[:, o*in+i].
        parts = []
        for ci in range(n_chunks):
            c0 = ci * chunk
            h3c = _dot(h, wl_ref[:, c0: c0 + chunk], dtype) \
                + bl_ref[:, c0: c0 + chunk]
            v = h3c * xrep
            for oo in range(noc):
                parts.append(jnp.sum(
                    v[:, oo * in_channels: (oo + 1) * in_channels],
                    axis=1, keepdims=True))
        msg_ref[:] = jnp.concatenate(parts, axis=1)
        return
    acc = jnp.zeros_like(msg_ref)
    for ci in range(n_chunks):
        c0 = ci * chunk
        h3c = _dot(h, wl_ref[:, c0: c0 + chunk], dtype) \
            + bl_ref[:, c0: c0 + chunk]
        acc += _dot(h3c * xrep,
                    _sel_qt_omj(in_channels, out_channels, c0, chunk,
                                sel_dtype), dtype)
    msg_ref[:] = acc


def _bwd_dx_kernel_omj(in_channels, out_channels, chunk, n_chunks,
                       dtype, *refs):
    h2_ref, x_ref, g_ref, wl_ref = refs[:4]
    dx_ref, dh_ref = refs[4:]

    noc = chunk // in_channels
    g = g_ref[:]
    xrep = _tile_lanes(x_ref[:], noc)
    if dtype is not None:
        xrep = xrep.astype(dtype)
    dx = jnp.zeros_like(dx_ref)
    dh = jnp.zeros_like(dh_ref)
    for ci in range(n_chunks):
        c0 = ci * chunk
        grep = _interleave_bcast(g, c0 // in_channels, noc, in_channels)
        wl_c = wl_ref[:, c0: c0 + chunk]
        h3c = _dot(h2_ref[:], wl_c, dtype)
        v = h3c * grep
        for oo in range(noc):
            dx += v[:, oo * in_channels: (oo + 1) * in_channels]
        dh += _dot_general(xrep * grep, wl_c, (((1,), (1,)), ((), ())),
                           dtype)
    dx_ref[:] = dx
    dh_ref[:] = dh


def _bwd_merged_kernel_omj(in_channels, out_channels, chunk, n_chunks,
                           n_blocks, dtype, use_scratch, *refs):
    """Single-pass o-major backward: dx/dh per edge block + dwl/dbl
    accumulated across the sequential E grid. Shares the h2/x/g
    streams, the grep broadcasts, and the xrep tile between the dx and
    dw halves — the split kernels stream and rebuild them twice.

    use_scratch=True accumulates dwl/dbl in VMEM scratch and writes the
    output once on the last grid step (3 x [kw, c_total] f32 resident:
    Wl + scratch + output block) — this is the PRODUCTION form; the
    _fits gate below budgets its third slab. use_scratch=False
    ("noscr") accumulates directly into the revisited output block
    (2 slabs, fits VMEM more easily) but Mosaic appears to unroll the
    sequential grid for it: 255 s compile at grid=16, remote-helper
    timeout at grid>=256 (scripts/merged_probe.py) — kept only as an
    explicit pin for future-toolchain re-probes."""
    h2_ref, x_ref, g_ref, wl_ref = refs[:4]
    dx_ref, dh_ref, dwl_ref, dbl_ref = refs[4:8]
    if use_scratch:
        dwl_acc, dbl_acc = refs[8:]
    else:
        dwl_acc, dbl_acc = dwl_ref, dbl_ref

    ei = pl.program_id(0)
    noc = chunk // in_channels
    g = g_ref[:]
    xrep = _tile_lanes(x_ref[:], noc)
    if dtype is not None:
        xrep = xrep.astype(dtype)

    @pl.when(ei == 0)
    def _():
        dwl_acc[:] = jnp.zeros_like(dwl_acc)
        dbl_acc[:] = jnp.zeros_like(dbl_acc)

    dx = jnp.zeros_like(dx_ref)
    dh = jnp.zeros_like(dh_ref)
    for ci in range(n_chunks):
        c0 = ci * chunk
        grep = _interleave_bcast(g, c0 // in_channels, noc, in_channels)
        wl_c = wl_ref[:, c0: c0 + chunk]
        h3c = _dot(h2_ref[:], wl_c, dtype)
        v = h3c * grep
        for oo in range(noc):
            dx += v[:, oo * in_channels: (oo + 1) * in_channels]
        dpre = xrep * grep
        dh += _dot_general(dpre, wl_c, (((1,), (1,)), ((), ())), dtype)
        dwl_acc[:, c0: c0 + chunk] += _dot_general(
            h2_ref[:], dpre, (((0,), (0,)), ((), ())), dtype)
        dbl_acc[:, c0: c0 + chunk] += jnp.sum(dpre, axis=0,
                                              keepdims=True)
    dx_ref[:] = dx
    dh_ref[:] = dh

    if use_scratch:
        @pl.when(ei == n_blocks - 1)
        def _():
            dwl_ref[:] = dwl_acc[:]
            dbl_ref[:] = dbl_acc[:]


def _bwd_dw_kernel_omj(in_channels, out_channels, chunk, n_chunks,
                       dtype, *refs):
    h2_ref, x_ref, g_ref = refs[:3]
    dwl_ref, dbl_ref = refs[3:]

    ei = pl.program_id(0)
    noc = chunk // in_channels
    g = g_ref[:]
    xrep = _tile_lanes(x_ref[:], noc)
    if dtype is not None:
        xrep = xrep.astype(dtype)

    @pl.when(ei == 0)
    def _():
        dwl_ref[:] = jnp.zeros_like(dwl_ref)
        dbl_ref[:] = jnp.zeros_like(dbl_ref)

    for ci in range(n_chunks):
        c0 = ci * chunk
        grep = _interleave_bcast(g, c0 // in_channels, noc, in_channels)
        dpre = xrep * grep
        dwl_ref[:, c0: c0 + chunk] += _dot_general(
            h2_ref[:], dpre, (((0,), (0,)), ((), ())), dtype)
        dbl_ref[:, c0: c0 + chunk] += jnp.sum(dpre, axis=0,
                                              keepdims=True)


# ------------------------------------------- backward kernel 1: dx, dh2

def _bwd_dx_kernel(in_channels, out_channels, chunk, dtype, *refs):
    h2_ref, x_ref, g_ref, wl_ref = refs[:4]
    dx_ref, dh_ref = refs[4:]

    ci = pl.program_id(1)
    c0 = ci * chunk
    sel_dtype = dtype or jnp.float32

    @pl.when(ci == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    g = g_ref[:]
    grep = _tile_lanes(g, chunk // out_channels)
    h3c = _dot(h2_ref[:], wl_ref[:], dtype)
    dx_ref[:] += _dot(h3c * grep,
                      _sel_p(in_channels, out_channels, c0, chunk,
                             sel_dtype, transpose=True), dtype)
    xrep = _dot(x_ref[:], _sel_p(in_channels, out_channels, c0, chunk,
                                 sel_dtype), dtype)
    dpre = xrep * grep
    dh_ref[:] += _dot_general(dpre, wl_ref[:], (((1,), (1,)), ((), ())),
                              dtype)


# ------------------------------------------- backward kernel 2: dW, db

def _bwd_dw_kernel(in_channels, out_channels, chunk, dtype, *refs):
    h2_ref, x_ref, g_ref = refs[:3]
    dwl_ref, dbl_ref = refs[3:]

    ei = pl.program_id(1)
    ci = pl.program_id(0)
    c0 = ci * chunk
    sel_dtype = dtype or jnp.float32

    g = g_ref[:]
    grep = _tile_lanes(g, chunk // out_channels)
    xrep = _dot(x_ref[:], _sel_p(in_channels, out_channels, c0, chunk,
                                 sel_dtype), dtype)
    dpre = xrep * grep
    dwl = _dot_general(h2_ref[:], dpre, (((0,), (0,)), ((), ())), dtype)
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
                  dtype_name, interpret, chunk=None,
                  dim_semantics=True, resident=False, layout="i",
                  merged_bwd=False, fwd_qt="gemm", wl_bf16=False):
    n_layers = len(layer_dims)
    n_small = n_layers - 1
    a_dim = layer_dims[0][0]
    kw_last = layer_dims[-1][0]
    c_total = layer_dims[-1][1]
    if chunk is None:
        chunk = min(C_CHUNK, c_total)
    assert c_total % chunk == 0 and chunk % out_channels == 0
    if layout == "o":
        # o-major chunks must cover whole out-blocks (in-aligned)
        assert chunk % in_channels == 0
        perm = _omajor_perm(in_channels, out_channels)
        inv_perm = np.argsort(perm)
    n_chunks = c_total // chunk
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None

    def _cast_wl(w):
        # bf16-resident Wl (o-major, bf16 compute only): numerically
        # identical — the kernels cast Wl to bf16 at every _dot anyway —
        # but the VMEM slab halves (4 -> 2 MB at kw=256, c=4096), which
        # is what unlocks block_e=512 for the merged backward (round-5
        # probe; the fit math lives in fused_edge_messages' _fits).
        return w.astype(jnp.bfloat16) if wl_bf16 else w

    def params_for(grid_order):
        # Declare which grid axis is embarrassingly parallel so Mosaic
        # can pipeline/parallelize it; the axis that accumulates into a
        # revisited output block stays 'arbitrary' (sequential).
        # grid_order: 'ec' = (E_blocks, n_chunks), 'ce' = transposed.
        if interpret or not dim_semantics:
            return None
        # both grids put the independent axis first: 'ec' iterates
        # (E parallel, chunks accumulate), 'ce' (chunks parallel,
        # E accumulates)
        sem = (pltpu.GridDimensionSemantics.PARALLEL,
               pltpu.GridDimensionSemantics.ARBITRARY)
        return pltpu.CompilerParams(dimension_semantics=sem)

    def const_spec(i, o, ndims=2):
        return pl.BlockSpec((i, o), lambda ei, ci: (0, 0),
                            memory_space=pltpu.VMEM)

    def small_weight_specs():
        specs = []
        for (i, o) in layer_dims[:-1]:
            specs.append(const_spec(i, o))
            specs.append(const_spec(1, o))
        return specs

    def edge_spec(w):
        return pl.BlockSpec((block_e, w), lambda ei, ci: (ei, 0),
                            memory_space=pltpu.VMEM)

    def edge_spec1(w):
        return pl.BlockSpec((block_e, w), lambda ei: (ei, 0),
                            memory_space=pltpu.VMEM)

    def const_spec1(i, o):
        return pl.BlockSpec((i, o), lambda ei: (0, 0),
                            memory_space=pltpu.VMEM)

    def small_weight_specs1():
        specs = []
        for (i, o) in layer_dims[:-1]:
            specs.append(const_spec1(i, o))
            specs.append(const_spec1(1, o))
        return specs

    def params1(parallel=True):
        if interpret or not dim_semantics:
            return None
        sem = (pltpu.GridDimensionSemantics.PARALLEL if parallel
               else pltpu.GridDimensionSemantics.ARBITRARY,)
        return pltpu.CompilerParams(dimension_semantics=sem)

    def fwd_impl(x_src, attr, flat):
        e = x_src.shape[0]
        e_pad = ((e + block_e - 1) // block_e) * block_e
        xs = _pad_e(x_src, e_pad)
        at = _pad_e(attr, e_pad)
        if layout == "o":
            wlp = _cast_wl(flat[2 * n_small][:, perm])
            blp = flat[2 * n_small + 1][:, perm]
            kernel = functools.partial(_fwd_kernel_omj, in_channels,
                                       out_channels, n_small, chunk,
                                       n_chunks, dtype,
                                       fwd_qt == "slices")
            msg = pl.pallas_call(
                kernel,
                grid=(e_pad // block_e,),
                in_specs=[edge_spec1(in_channels), edge_spec1(a_dim)]
                + small_weight_specs1()
                + [const_spec1(kw_last, c_total), const_spec1(1, c_total)],
                out_specs=edge_spec1(out_channels),
                out_shape=jax.ShapeDtypeStruct((e_pad, out_channels),
                                               jnp.float32),
                interpret=interpret,
                compiler_params=params1(parallel=True),
            )(xs, at, *flat[: 2 * n_small], wlp, blp)
            return msg[:e]
        if resident:
            kernel = functools.partial(_fwd_kernel_res, in_channels,
                                       out_channels, n_small, chunk,
                                       n_chunks, dtype)
            msg = pl.pallas_call(
                kernel,
                grid=(e_pad // block_e,),
                in_specs=[edge_spec1(in_channels), edge_spec1(a_dim)]
                + small_weight_specs1()
                + [const_spec1(kw_last, c_total), const_spec1(1, c_total)],
                out_specs=edge_spec1(out_channels),
                out_shape=jax.ShapeDtypeStruct((e_pad, out_channels),
                                               jnp.float32),
                interpret=interpret,
                compiler_params=params1(parallel=True),
            )(xs, at, *flat)
            return msg[:e]
        grid = (e_pad // block_e, n_chunks)
        kernel = functools.partial(_fwd_kernel, in_channels, out_channels,
                                   n_small, chunk, dtype)
        wl_spec = pl.BlockSpec((kw_last, chunk), lambda ei, ci: (0, ci),
                               memory_space=pltpu.VMEM)
        bl_spec = pl.BlockSpec((1, chunk), lambda ei, ci: (0, ci),
                               memory_space=pltpu.VMEM)
        msg = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[edge_spec(in_channels), edge_spec(a_dim)]
            + small_weight_specs() + [wl_spec, bl_spec],
            out_specs=edge_spec(out_channels),
            out_shape=jax.ShapeDtypeStruct((e_pad, out_channels),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_e, kw_last), jnp.float32)],
            interpret=interpret,
            compiler_params=params_for("ec"),
        )(xs, at, *flat)
        return msg[:e]

    def bwd_big(h2, x_src, g, w_last):
        e = x_src.shape[0]
        e_pad = ((e + block_e - 1) // block_e) * block_e
        h2p = _pad_e(h2, e_pad)
        xs = _pad_e(x_src, e_pad)
        gp = _pad_e(g, e_pad)

        if layout == "o" and merged_bwd:
            wlp = _cast_wl(w_last[:, perm])
            nb = e_pad // block_e
            # Measured (scripts/merged_probe.py, real v5e): accumulating
            # into the REVISITED OUTPUT block ("noscr") makes Mosaic
            # compile in 255 s at grid=16 and time out the remote
            # compile helper at grid>=256 — it appears to unroll the
            # sequential grid. The VMEM-scratch form compiles in
            # seconds at any grid; its cost is THREE [kw, c_total] f32
            # slabs resident (Wl + scratch + output block), which the
            # auto tile gate below accounts for. noscr stays as an
            # explicit pin for future-toolchain re-probes only.
            use_scratch = merged_bwd != "noscr"
            k = functools.partial(_bwd_merged_kernel_omj, in_channels,
                                  out_channels, chunk, n_chunks, nb,
                                  dtype, use_scratch)
            dx, dh2, dwl_p, dbl_p = pl.pallas_call(
                k,
                grid=(nb,),
                in_specs=[edge_spec1(kw_last), edge_spec1(in_channels),
                          edge_spec1(out_channels),
                          const_spec1(kw_last, c_total)],
                out_specs=[edge_spec1(in_channels), edge_spec1(kw_last),
                           const_spec1(kw_last, c_total),
                           const_spec1(1, c_total)],
                out_shape=[
                    jax.ShapeDtypeStruct((e_pad, in_channels),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((e_pad, kw_last), jnp.float32),
                    jax.ShapeDtypeStruct((kw_last, c_total), jnp.float32),
                    jax.ShapeDtypeStruct((1, c_total), jnp.float32),
                ],
                scratch_shapes=([
                    pltpu.VMEM((kw_last, c_total), jnp.float32),
                    pltpu.VMEM((1, c_total), jnp.float32),
                ] if use_scratch else []),
                interpret=interpret,
                # dwl/dbl accumulate across E steps — sequential axis
                compiler_params=params1(parallel=False),
            )(h2p, xs, gp, wlp)
            return dwl_p[:, inv_perm], dbl_p[:, inv_perm], dx[:e], dh2[:e]

        if layout == "o":
            wlp = _cast_wl(w_last[:, perm])
            k1 = functools.partial(_bwd_dx_kernel_omj, in_channels,
                                   out_channels, chunk, n_chunks, dtype)
            dx, dh2 = pl.pallas_call(
                k1,
                grid=(e_pad // block_e,),
                in_specs=[edge_spec1(kw_last), edge_spec1(in_channels),
                          edge_spec1(out_channels),
                          const_spec1(kw_last, c_total)],
                out_specs=[edge_spec1(in_channels), edge_spec1(kw_last)],
                out_shape=[
                    jax.ShapeDtypeStruct((e_pad, in_channels),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((e_pad, kw_last), jnp.float32),
                ],
                interpret=interpret,
                compiler_params=params1(parallel=True),
            )(h2p, xs, gp, wlp)

            k2 = functools.partial(_bwd_dw_kernel_omj, in_channels,
                                   out_channels, chunk, n_chunks, dtype)
            dwl_p, dbl_p = pl.pallas_call(
                k2,
                grid=(e_pad // block_e,),
                in_specs=[edge_spec1(kw_last), edge_spec1(in_channels),
                          edge_spec1(out_channels)],
                out_specs=[const_spec1(kw_last, c_total),
                           const_spec1(1, c_total)],
                out_shape=[
                    jax.ShapeDtypeStruct((kw_last, c_total), jnp.float32),
                    jax.ShapeDtypeStruct((1, c_total), jnp.float32),
                ],
                interpret=interpret,
                # accumulates across E steps — axis must stay sequential
                compiler_params=params1(parallel=False),
            )(h2p, xs, gp)
            # weight grads come back in o-major columns; un-permute
            return dwl_p[:, inv_perm], dbl_p[:, inv_perm], dx[:e], dh2[:e]

        if resident:
            k1 = functools.partial(_bwd_dx_kernel_res, in_channels,
                                   out_channels, chunk, n_chunks, dtype)
            dx, dh2 = pl.pallas_call(
                k1,
                grid=(e_pad // block_e,),
                in_specs=[edge_spec1(kw_last), edge_spec1(in_channels),
                          edge_spec1(out_channels),
                          const_spec1(kw_last, c_total)],
                out_specs=[edge_spec1(in_channels), edge_spec1(kw_last)],
                out_shape=[
                    jax.ShapeDtypeStruct((e_pad, in_channels),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((e_pad, kw_last), jnp.float32),
                ],
                interpret=interpret,
                compiler_params=params1(parallel=True),
            )(h2p, xs, gp, w_last)

            k2 = functools.partial(_bwd_dw_kernel_res, in_channels,
                                   out_channels, chunk, n_chunks, dtype)
            dwl, dbl = pl.pallas_call(
                k2,
                grid=(e_pad // block_e,),
                in_specs=[edge_spec1(kw_last), edge_spec1(in_channels),
                          edge_spec1(out_channels)],
                out_specs=[const_spec1(kw_last, c_total),
                           const_spec1(1, c_total)],
                out_shape=[
                    jax.ShapeDtypeStruct((kw_last, c_total), jnp.float32),
                    jax.ShapeDtypeStruct((1, c_total), jnp.float32),
                ],
                interpret=interpret,
                # the dwl/dbl outputs accumulate across E steps — the
                # axis must stay sequential
                compiler_params=params1(parallel=False),
            )(h2p, xs, gp)
            return dwl, dbl, dx[:e], dh2[:e]

        # kernel 1: dx, dh2 (grid E x C, chunk accumulation)
        k1 = functools.partial(_bwd_dx_kernel, in_channels, out_channels,
                               chunk, dtype)
        wl_spec = pl.BlockSpec((kw_last, chunk), lambda ei, ci: (0, ci),
                               memory_space=pltpu.VMEM)
        dx, dh2 = pl.pallas_call(
            k1,
            grid=(e_pad // block_e, n_chunks),
            in_specs=[edge_spec(kw_last), edge_spec(in_channels),
                      edge_spec(out_channels), wl_spec],
            out_specs=[edge_spec(in_channels), edge_spec(kw_last)],
            out_shape=[
                jax.ShapeDtypeStruct((e_pad, in_channels), jnp.float32),
                jax.ShapeDtypeStruct((e_pad, kw_last), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=params_for("ec"),
        )(h2p, xs, gp, w_last)

        # kernel 2: dW, db (grid C x E, edge accumulation)
        k2 = functools.partial(_bwd_dw_kernel, in_channels, out_channels,
                               chunk, dtype)
        edge_t = lambda w: pl.BlockSpec((block_e, w),
                                        lambda ci, ei: (ei, 0),
                                        memory_space=pltpu.VMEM)
        dwl, dbl = pl.pallas_call(
            k2,
            grid=(n_chunks, e_pad // block_e),
            in_specs=[edge_t(kw_last), edge_t(in_channels),
                      edge_t(out_channels)],
            out_specs=[
                pl.BlockSpec((kw_last, chunk), lambda ci, ei: (0, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, chunk), lambda ci, ei: (0, ci),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kw_last, c_total), jnp.float32),
                jax.ShapeDtypeStruct((1, c_total), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=params_for("ce"),
        )(h2p, xs, gp)
        return dwl, dbl, dx[:e], dh2[:e]

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
        # the last layer's bias contributes to K and hence to dx:
        # K = h2 @ W_L + b_L; the kernel computed dx from h2 @ W_L only.
        b_last = flat[2 * n_small + 1]  # [1, c_total]
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


# Wl-resident auto gate: the full last-layer weight must leave VMEM
# room for the per-block working set (f32 input block + intermediates)
_RESIDENT_WL_MAX_BYTES = 6 * 1024 * 1024


def fused_edge_messages(x, senders, edge_attr, kernel_params, *,
                        in_channels: int, out_channels: int,
                        compute_dtype=None, block_e=None,
                        chunk=None, dim_semantics=True, resident=None,
                        layout=None, merged_bwd=None, fwd_qt="gemm",
                        sender_sort=None, interpret=None, wl_bf16=None):
    """[E, w_out] messages x_src @ kappa(attr), fused (no [E, w_in*w_out]
    HBM round-trip).

    interpret=None (default) auto-selects: Mosaic on TPU, the pallas
    interpreter elsewhere (CPU tests / virtual meshes) — Mosaic is
    TPU-only and pallas_call hard-errors on the CPU backend otherwise.

    layout: 'i' (reference i-major columns) or 'o' (o-major: Wl columns
    permuted once per call in XLA so both broadcast patterns are free
    VPU ops — see the o-major section above). None auto-selects.

    wl_bf16: stream/hold the resident Wl in bf16 (o-major + bf16 compute
    only; numerically identical — the kernels cast Wl at every _dot —
    but the dominant VMEM slab halves, unlocking block_e=512 for the
    merged backward). None auto-selects it exactly there.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert fused_path_supported(kernel_params, in_channels, out_channels), \
        "fused path unsupported for this kernel shape; use impl='scan'"
    dims = _layer_dims(kernel_params)
    if resident is None:
        # measured faster whenever Wl fits (scripts/fused_tune.py,
        # PERF_NOTES round 3): one weight fetch total instead of one
        # chunk re-stream per edge block, single parallel E grid axis
        resident = dims[-1][0] * dims[-1][1] * 4 <= _RESIDENT_WL_MAX_BYTES
    if layout is None:
        # o-major measured fastest wherever it applies (round-3 sweep:
        # fwd 32.3 -> 26.1 ms, fwd+bwd 131.4 -> 118.0 ms at E=1.2M)
        layout = "o" if resident else "i"
    if layout == "o" and not resident:
        # o-major is implemented on the resident-Wl form only
        layout = "i"
    kw_last, c_total = dims[-1]
    auto_chunk = chunk is None
    auto_block = block_e is None
    if layout == "o" and not auto_chunk and chunk % in_channels:
        layout = "i"
    if merged_bwd is None:
        # single-pass merged backward measured fastest wherever it
        # dispatches (round-4 TPU timing, E=1.2M kw=256:
        # split 118.8 / st-gather 115.2 / merged 113.9 / merged+st
        # 108.7 ms — scripts/fused_bwd_breakdown.py); pass False to pin
        # the split kernels
        merged_bwd = layout == "o"
    if resident and auto_chunk:
        # measured best at uai4 scale (fused_tune round 3): small chunks
        # win once Wl is resident — the chunk loop is in-kernel, so
        # smaller h3c/xrep tiles leave VMEM room for bigger edge blocks
        align = out_channels if layout == "i" \
            else int(np.lcm(in_channels, out_channels))
        chunk = max(align, min(512, c_total))
        while c_total % chunk or chunk % align:
            chunk -= align
    if auto_block:
        # larger edge blocks amortize grid-step overhead; shrink as the
        # streamed weight chunk and block activations grow. o-major
        # holds the [block_e, chunk] tile pattern alongside the chunk
        # loop's working tiles — be=1024 fails Mosaic at this shape
        # (round-3 sweep) and be=512 measured best anyway.
        block_e = 1024 if kw_last <= 256 else (
            512 if kw_last <= 512 else 256)
        if layout == "o":
            block_e = min(block_e, 512)
    _is_bf16 = compute_dtype in ("bfloat16", jnp.bfloat16)
    if wl_bf16 is None:
        # candidate default: True exactly where it is numerically a
        # no-op (bf16 compute, o-major resident Wl). Kept OFF until the
        # round-5 TPU probe (scripts/fused_bwd_breakdown.py wl-bf16
        # arms) proves Mosaic compiles the be=512 merged kernel —
        # flip to `bool(_is_bf16 and layout == "o" and resident)` then.
        wl_bf16 = False
    _wl_bf16_eff = bool(wl_bf16 and layout == "o" and resident
                        and _is_bf16)
    if resident and not interpret and (auto_chunk or auto_block):
        # Mosaic VMEM fit (v5e: 16 MB/core): resident Wl (f32) + the
        # two [block_e, chunk] f32 working tiles (h3c, xrep) + double
        # buffering must fit; combos beyond this bound failed to
        # compile in the round-3 sweep (be=1024/ch>=1024, be=512/
        # ch=2048). Shrink chunk first (in-kernel loop, cheap), then
        # block_e. Explicitly-passed knobs are honored as-is
        # (measurement scripts need true failures, not silent refits).
        # The merged backward holds 3 [kw, c_total] slabs (Wl + dwl
        # scratch + dwl output) plus double-buffered h2 edge streams:
        # measured fit boundary at uai4 shapes is be=256/ch=256 OK,
        # be=512/ch=256 FAIL (scripts/merged_probe.py).
        # budget the merged kernel's slabs only when it can actually
        # dispatch (same condition as bwd_big: o-major layout + flag);
        # 'noscr' holds 2 slabs (no VMEM scratch), True holds 3
        merged_eff = merged_bwd if layout == "o" else False
        n_slabs = 2 if merged_eff == "noscr" else 3
        wl_bytes = 2 if _wl_bf16_eff else 4

        def _fits(be, ch):
            if merged_eff:
                # Wl slab at its storage dtype + dwl scratch/output f32
                return (kw_last * c_total * wl_bytes
                        + (n_slabs - 1) * kw_last * c_total * 4
                        + 3 * be * ch * 4
                        + 4 * be * kw_last * 4) <= 14_500_000
            return kw_last * c_total * wl_bytes + 3 * be * ch * 4 \
                <= 12 * 1024 * 1024
        eff_chunk = chunk if chunk is not None else min(C_CHUNK, c_total)
        shrink_align = out_channels if layout == "i" \
            else int(np.lcm(in_channels, out_channels))
        if merged_eff:
            # the slab term dominates the merged budget; shrinking chunk
            # barely moves it — shrink block_e first so the chunk stays
            # at its measured-best size (be=256/ch=256 at uai4 shapes)
            while auto_block and not _fits(block_e, eff_chunk) \
                    and block_e > 256:
                block_e //= 2
        while auto_chunk and not _fits(block_e, eff_chunk) \
                and eff_chunk > shrink_align \
                and (eff_chunk // 2) % shrink_align == 0 \
                and c_total % (eff_chunk // 2) == 0:
            eff_chunk //= 2
        while auto_block and not _fits(block_e, eff_chunk) \
                and block_e > 256:
            block_e //= 2
        chunk = eff_chunk
    dtype_name = "bfloat16" if compute_dtype in ("bfloat16", jnp.bfloat16) \
        else None
    fused = _get_fused_fn(dims, in_channels, out_channels, block_e,
                          dtype_name, interpret, chunk=chunk,
                          dim_semantics=dim_semantics, resident=resident,
                          layout=layout, merged_bwd=merged_bwd,
                          fwd_qt=fwd_qt if layout == "o" else "gemm",
                          wl_bf16=_wl_bf16_eff)
    from .segment import gather_rows, gather_rows_st

    flat = tuple(_flatten_params(kernel_params))
    if sender_sort is not None and sender_sort[0] is not None \
            and sender_sort[1] > 0:
        # scatter-free gather transpose (graph.sender_perm/sender_span)
        x_src = gather_rows_st(x, senders, sender_sort[0], sender_sort[1])
    else:
        x_src = gather_rows(x, senders)
    return fused(x_src, edge_attr, flat)


__all__ = ["fused_edge_messages", "fused_path_supported",
           "DEFAULT_BLOCK_E", "C_CHUNK"]
