"""Per-edge contraction against cached kernel matrices.

Companion to the kcached execution mode (models/gkn.py): when the kernel
matrices K = kappa(edge_attr) are computed once per forward and reused
across the depth iterations, each iteration reduces to

    msg[e, o] = sum_i x_src[e, i] * K[e, i*w_out + o]

XLA lowers this einsum to a VPU-heavy batched matvec; this op runs it as
MXU selector-GEMMs instead (same trick as pallas_edge_conv — Mosaic
cannot reshape [blk, w_in*w_out] -> [blk, w_in, w_out]):

    Xrep = x @ P             P[i, c]  = (c // w_out == i)
    msg  = (K ∘ Xrep) @ QT   QT[c, o] = (c %  w_out == o)

K is streamed in column chunks. The backward is ONE kernel on the same
grid emitting both cotangents:
    dx  += (K_c ∘ Grep) @ PT_c     (accumulated over chunks)
    dK_c = Xrep_c ∘ Grep           (chunk-disjoint, written directly)
with Grep the lane-tiled g (concat, Mosaic-supported).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_E = 512
C_CHUNK = 1024


def contraction_supported(e: int, in_channels: int,
                          out_channels: int) -> bool:
    c = in_channels * out_channels
    chunk = min(C_CHUNK, c)
    return c % chunk == 0 and chunk % out_channels == 0


def _sel_p(in_channels, out_channels, c0, chunk, transpose=False):
    if transpose:
        cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, in_channels), 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, in_channels), 1)
    else:
        cc = jax.lax.broadcasted_iota(jnp.int32, (in_channels, chunk), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (in_channels, chunk), 0)
    return ((c0 + cc) // out_channels == rows).astype(jnp.float32)


def _sel_qt(out_channels, chunk):
    cc = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, out_channels), 1)
    return (cc % out_channels == cols).astype(jnp.float32)


def _tile_lanes(g, n):
    return g if n == 1 else jnp.concatenate([g] * n, axis=1)


def _fwd_kernel(in_channels, out_channels, chunk, *refs):
    x_ref, k_ref, msg_ref = refs
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        msg_ref[:] = jnp.zeros_like(msg_ref)

    xrep = jnp.dot(x_ref[:], _sel_p(in_channels, out_channels, ci * chunk,
                                    chunk),
                   preferred_element_type=jnp.float32)
    kc = k_ref[:].astype(jnp.float32)
    msg_ref[:] += jnp.dot(kc * xrep, _sel_qt(out_channels, chunk),
                          preferred_element_type=jnp.float32)


def _bwd_kernel(in_channels, out_channels, chunk, k_dtype, *refs):
    x_ref, k_ref, g_ref, dx_ref, dk_ref = refs
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    g = g_ref[:]
    grep = _tile_lanes(g, chunk // out_channels)
    kc = k_ref[:].astype(jnp.float32)
    dx_ref[:] += jnp.dot(kc * grep,
                         _sel_p(in_channels, out_channels, ci * chunk,
                                chunk, transpose=True),
                         preferred_element_type=jnp.float32)
    xrep = jnp.dot(x_ref[:], _sel_p(in_channels, out_channels, ci * chunk,
                                    chunk),
                   preferred_element_type=jnp.float32)
    dk_ref[:] = (xrep * grep).astype(k_dtype)


def _pad_e(arr, e_pad):
    e = arr.shape[0]
    if e == e_pad:
        return arr
    return jnp.pad(arr, [(0, e_pad - e)] + [(0, 0)] * (arr.ndim - 1))


@functools.lru_cache(maxsize=64)
def _get_fn(in_channels, out_channels, block_e, k_dtype_name, interpret):
    c_total = in_channels * out_channels
    chunk = min(C_CHUNK, c_total)
    n_chunks = c_total // chunk
    k_dtype = jnp.bfloat16 if k_dtype_name == "bfloat16" else jnp.float32

    def edge_spec(width):
        return pl.BlockSpec((block_e, width), lambda ei, ci: (ei, 0),
                            memory_space=pltpu.VMEM)

    def k_spec():
        return pl.BlockSpec((block_e, chunk), lambda ei, ci: (ei, ci),
                            memory_space=pltpu.VMEM)

    def fwd_impl(x_src, K):
        e = x_src.shape[0]
        e_pad = ((e + block_e - 1) // block_e) * block_e
        msg = pl.pallas_call(
            functools.partial(_fwd_kernel, in_channels, out_channels,
                              chunk),
            grid=(e_pad // block_e, n_chunks),
            in_specs=[edge_spec(in_channels), k_spec()],
            out_specs=edge_spec(out_channels),
            out_shape=jax.ShapeDtypeStruct((e_pad, out_channels),
                                           jnp.float32),
            interpret=interpret,
        )(_pad_e(x_src, e_pad), _pad_e(K, e_pad))
        return msg[:e]

    def bwd_impl(x_src, K, g):
        e = x_src.shape[0]
        e_pad = ((e + block_e - 1) // block_e) * block_e
        dx, dk = pl.pallas_call(
            functools.partial(_bwd_kernel, in_channels, out_channels,
                              chunk, k_dtype),
            grid=(e_pad // block_e, n_chunks),
            in_specs=[edge_spec(in_channels), k_spec(),
                      edge_spec(out_channels)],
            out_specs=[edge_spec(in_channels), k_spec()],
            out_shape=[
                jax.ShapeDtypeStruct((e_pad, in_channels), jnp.float32),
                jax.ShapeDtypeStruct((e_pad, c_total), k_dtype),
            ],
            interpret=interpret,
        )(_pad_e(x_src, e_pad), _pad_e(K, e_pad), _pad_e(g, e_pad))
        return dx[:e], dk[:e]

    @jax.custom_vjp
    def contract(x_src, K):
        return fwd_impl(x_src, K)

    def contract_fwd(x_src, K):
        return fwd_impl(x_src, K), (x_src, K)

    def contract_bwd(res, g):
        # The all-pallas backward (bwd_impl) measured SLOWER end-to-end
        # than XLA's fused version of these formulas (the dK write
        # dominates and XLA fuses the outer product into it), so the
        # backward stays in XLA. bwd_impl is kept for future tuning.
        x_src, K = res
        e = x_src.shape[0]
        k3 = K.reshape(e, in_channels, out_channels)
        dx = jnp.einsum("eo,eio->ei", g, k3.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        dk = (x_src[:, :, None] * g[:, None, :]).reshape(e, c_total)
        return dx.astype(x_src.dtype), dk.astype(K.dtype)

    contract.defvjp(contract_fwd, contract_bwd)
    return contract


def cached_contraction(x_src, K, *, in_channels: int, out_channels: int,
                       block_e: int = DEFAULT_BLOCK_E,
                       interpret: bool = False):
    """msg[e] = x_src[e] @ K[e].reshape(in, out). K: [E, in*out]
    (f32 or bf16)."""
    k_dtype_name = "bfloat16" if K.dtype == jnp.bfloat16 else "float32"
    fn = _get_fn(in_channels, out_channels, block_e, k_dtype_name,
                 interpret)
    return fn(x_src, K)


__all__ = ["cached_contraction", "contraction_supported"]


def apply_cached_kernel(x_src, kk2d, in_channels, out_channels):
    """Cached-K contraction used by the kcached model paths.

    Formulation: broadcast-multiply + reduce over the input channel,

        msg[e, o] = sum_i K3[e, i, o] * x[e, i]

    NOT an einsum/dot. The per-edge matvec is HBM-bandwidth-bound (the
    only real work is streaming K once per iteration), and measured on
    the v5e the reduce formulation is the only one that reaches the
    streaming floor for bf16 K: einsum lowers to a batched matvec that
    runs the bf16 path ~2.8x SLOWER (7.4 vs 2.7 ms at E=92k), while
    this form hits 2.66 ms vs a 2.84 ms pure-read reference. End-to-end
    it cut the bench train step 24.9 -> 15.3 ms/batch with bf16 K.

    Products are computed in K's dtype (bf16 K => bf16 multiplies, f32
    accumulation — the same contract as the MXU's native
    bf16-input/f32-accumulate matmul). Earlier attempts and their
    measurements (pallas selector-GEMM, custom_vjp fusion blocking) are
    recorded in PERF_NOTES.md; `cached_contraction` remains available
    (tested) for a future fully-fused iteration-loop kernel.
    """
    import jax.numpy as jnp

    kk = kk2d.reshape(x_src.shape[0], in_channels, out_channels)
    if kk.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # fp8 is a STORAGE format only: upcast to bf16 for the multiply
        # (fp8*fp8 products would also quantize x). The fp8->bf16
        # convert runs at stream rate on the v5e — measured 7.5 -> 5.6
        # ms/iter at E=383k vs bf16 storage (scripts/fp8_shootout.py).
        kk = kk.astype(jnp.bfloat16)
    return jnp.sum(kk * x_src.astype(kk.dtype)[:, :, None], axis=1,
                   dtype=jnp.float32)


__all__.append("apply_cached_kernel")


def quantize_ste(x, dtype):
    """Straight-through fp8 quantization of the cached kernel matrices.

    Forward value: x rounded to `dtype` (f8_e4m3/f8_e5m2) and upcast
    back to x.dtype, so downstream consumers see fp8-quantized VALUES
    but the array DTYPE stays bf16/f32. Backward: identity (the
    custom_jvp passes the tangent through untouched), so the dK
    cotangent reaching the kappa-MLP backward keeps full precision —
    threading an actual fp8-dtyped array through the depth loop instead
    makes JAX's cotangents fp8 too (cotangent dtype == primal dtype),
    which measurably wrecks convergence (uai3 A/B in RESULTS.md:
    0.249 vs 0.108 control test rel-L2).

    The optimization_barrier pins the fp8 array as the materialized
    value so XLA cannot fold quantize+upcast into an identity; the
    upcast is a cheap duplicable convert that fuses into each depth
    iteration's consumer fusion, so the loop-resident K stream reads
    1 byte/elem. Measured on the v5e (scripts/fp8_ste_check.py,
    E=383k w=64): 6.90 vs 8.04 ms/iter bf16 in an UNROLLED depth
    chain (gkn_apply's structure) — but 2x SLOWER across a fori_loop
    boundary, where XLA rematerializes a bf16 copy every iteration.
    Only use with unrolled consumers; re-verify when changing JAX
    versions.
    """
    import functools

    import jax

    @functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
    def _quant(x, dt):
        q8 = jax.lax.optimization_barrier(x.astype(dt))
        return q8.astype(x.dtype)

    @_quant.defjvp
    def _quant_jvp(dt, primals, tangents):
        (xp,), (xt,) = primals, tangents
        return _quant(xp, dt), xt

    return _quant(x, dtype)


__all__.append("quantize_ste")


def maybe_quantize_k(kk, k_storage):
    """Apply the fp8-STE storage policy named by `k_storage` to a cached
    kernel-matrix array (None / 'float8_e4m3' / 'float8_e5m2').

    One resolver shared by every kcached model (GKN + both MGKNs) so
    the storage-name -> dtype mapping and the unrolled-consumer caveat
    (see quantize_ste) live in one place."""
    if k_storage is None:
        return kk
    fp8 = {"float8_e4m3": jnp.float8_e4m3fn,
           "float8_e5m2": jnp.float8_e5m2}.get(k_storage)
    if fp8 is None:
        raise ValueError(f"unknown k_storage {k_storage!r}")
    return quantize_ste(kk, fp8)


__all__.append("maybe_quantize_k")
