"""Fused Pallas edge-kernel parity tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_pde_tpu.ops import dense_init, dense_apply
from graph_pde_tpu.ops.pallas_edge_conv import (
    fused_edge_messages, fused_path_supported,
)


def _setup(e=300, n=50, w=16, a_dim=6, kw=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
    attr = jnp.asarray(rng.normal(size=(e, a_dim)).astype(np.float32))
    kparams = dense_init(jax.random.PRNGKey(seed), [a_dim, kw, kw, w * w])
    return x, senders, attr, kparams


def _ref_messages(x, senders, attr, kparams, w):
    k = dense_apply(kparams, attr)
    kk = k.reshape(attr.shape[0], w, w)
    return jnp.einsum("ei,eio->eo", x[senders], kk)


def test_fused_forward_matches_reference():
    w = 16
    x, senders, attr, kparams = _setup(w=w)
    ref = _ref_messages(x, senders, attr, kparams, w)
    out = fused_edge_messages(x, senders, attr, kparams, in_channels=w,
                              out_channels=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_fused_forward_nonmultiple_block():
    """E not a multiple of the block size exercises the padding path."""
    w = 16
    x, senders, attr, kparams = _setup(e=47, w=w)
    ref = _ref_messages(x, senders, attr, kparams, w)
    out = fused_edge_messages(x, senders, attr, kparams, in_channels=w,
                              out_channels=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_fused_backward_matches_reference():
    w = 16
    x, senders, attr, kparams = _setup(e=256, w=w, seed=3)

    def loss_fused(x, attr, kp):
        msg = fused_edge_messages(x, senders, attr, kp, in_channels=w,
                                  out_channels=w, interpret=True)
        return jnp.sum(jnp.sin(msg) * msg)

    def loss_ref(x, attr, kp):
        msg = _ref_messages(x, senders, attr, kp, w)
        return jnp.sum(jnp.sin(msg) * msg)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, attr, kparams)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, attr, kparams)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_fused_under_vmap():
    """Batched graphs: vmap over the fused op (weights broadcast)."""
    w = 16
    b = 3
    rng = np.random.default_rng(7)
    n, e = 40, 256
    xs = jnp.asarray(rng.normal(size=(b, n, w)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, size=(b, e)).astype(np.int32))
    attrs = jnp.asarray(rng.normal(size=(b, e, 6)).astype(np.float32))
    kparams = dense_init(jax.random.PRNGKey(9), [6, 32, w * w])

    fused = jax.vmap(lambda x, s, a: fused_edge_messages(
        x, s, a, kparams, in_channels=w, out_channels=w, interpret=True))
    out = fused(xs, senders, attrs)
    ref = jax.vmap(lambda x, s, a: _ref_messages(x, s, a, kparams, w))(
        xs, senders, attrs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_fused_path_supported_gate():
    kp_small = dense_init(jax.random.PRNGKey(0), [6, 128, 256, 64 * 64])
    assert fused_path_supported(kp_small, 64, 64)
    # big kernel widths stream chunked and remain supported
    kp_big = dense_init(jax.random.PRNGKey(0), [6, 512, 1024, 64 * 64])
    assert fused_path_supported(kp_big, 64, 64)
    # diag-shaped output doesn't match full kernel
    kp_diag = dense_init(jax.random.PRNGKey(0), [6, 32, 64])
    assert not fused_path_supported(kp_diag, 64, 64)


def test_fused_large_kernel_width():
    """ker_width 1024 (UAI1 / orthogonal MGKN scale) via chunk streaming,
    at a reduced width to keep the CPU interpreter fast."""
    w = 8
    x, senders, attr, kparams = _setup(e=128, w=w, kw=1024, seed=11)
    ref = _ref_messages(x, senders, attr, kparams, w)
    out = fused_edge_messages(x, senders, attr, kparams, in_channels=w,
                              out_channels=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_cached_contraction_parity():
    """Pallas cached-K contraction (interpret mode) vs einsum oracle,
    forward and both cotangents."""
    from graph_pde_tpu.ops.cached_contraction import cached_contraction

    w = 16
    rng = np.random.default_rng(40)
    e = 300
    x = jnp.asarray(rng.normal(size=(e, w)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(e, w * w)).astype(np.float32))

    def ref(x, K):
        return jnp.einsum("ei,eio->eo", x, K.reshape(e, w, w))

    out = cached_contraction(x, K, in_channels=w, out_channels=w,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x, K)),
                               rtol=2e-5, atol=1e-5)

    g1 = jax.grad(lambda x, K: jnp.sum(jnp.sin(cached_contraction(
        x, K, in_channels=w, out_channels=w, interpret=True))),
        argnums=(0, 1))(x, K)
    g2 = jax.grad(lambda x, K: jnp.sum(jnp.sin(ref(x, K))),
                  argnums=(0, 1))(x, K)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_fused_variants_match():
    """All three kernel forms — streamed (column chunks on a second
    grid axis), Wl-resident (whole last layer in VMEM, single E grid),
    and o-major (permuted Wl columns, selector-free broadcasts) — must
    agree with the reference on values AND gradients; the auto gates
    route by Wl size/alignment, so each is pinned here explicitly."""
    w = 16
    x, senders, attr, kparams = _setup(e=256, w=w, seed=7)
    ref = _ref_messages(x, senders, attr, kparams, w)
    variants = [dict(resident=True), dict(resident=False),
                dict(resident=True, layout="o"),
                # True selects the VMEM-scratch accumulation form (the
                # production form); "noscr" pins the revisited-output
                # block form, which holds fewer slabs but Mosaic-compile
                # times out at real grids — kept covered for re-probes
                dict(resident=True, layout="o", merged_bwd=True),
                dict(resident=True, layout="o", merged_bwd="noscr"),
                # round-4 MFU probe: QTo GEMM replaced by VPU slice sums
                dict(resident=True, layout="o", fwd_qt="slices")]
    for kw in variants:
        out = fused_edge_messages(x, senders, attr, kparams,
                                  in_channels=w, out_channels=w,
                                  interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=f"variant={kw}")

        def loss(x, attr, kp, _kw=kw):
            msg = fused_edge_messages(x, senders, attr, kp,
                                      in_channels=w, out_channels=w,
                                      interpret=True, **_kw)
            return jnp.sum(jnp.sin(msg) * msg)

        def loss_ref(x, attr, kp):
            msg = _ref_messages(x, senders, attr, kp, w)
            return jnp.sum(jnp.sin(msg) * msg)

        g = jax.grad(loss, argnums=(0, 1, 2))(x, attr, kparams)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, attr, kparams)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5,
                                       err_msg=f"variant={kw}")


def test_fused_wl_bf16_slab_is_noop():
    """wl_bf16=True stores the resident o-major Wl slab in bf16; since
    the kernels cast Wl to bf16 at every dot under bf16 compute anyway,
    it must reproduce the wl_bf16=False bf16-compute result to bf16
    rounding (values and all grads) — the round-5 merged-backward
    block-size unlock must not change numerics."""
    w = 16
    x, senders, attr, kparams = _setup(e=256, w=w, seed=13)

    def run(wl_bf16):
        def loss(x, attr, kp):
            msg = fused_edge_messages(
                x, senders, attr, kp, in_channels=w, out_channels=w,
                compute_dtype="bfloat16", resident=True, layout="o",
                merged_bwd=True, wl_bf16=wl_bf16, interpret=True)
            return jnp.sum(jnp.sin(msg) * msg)

        v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            x, attr, kparams)
        return v, jax.tree_util.tree_leaves(g)

    v_f32, g_f32 = run(False)
    v_bf16, g_bf16 = run(True)
    np.testing.assert_allclose(float(v_f32), float(v_bf16),
                               rtol=2e-2, atol=1e-3)
    for a, b in zip(g_f32, g_bf16):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)


def test_scatter_free_gather_transpose_matches():
    """gather_rows_st (sender-sorted block-local one-hot transpose,
    graph.sender_perm/sender_span) must produce identical values and
    dx as the plain gather whose backward is XLA scatter-add."""
    from graph_pde_tpu.ops.segment import gather_rows_st

    rng = np.random.default_rng(11)
    n, e, w = 64, 1024, 16
    x = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    senders = rng.integers(0, n, size=e).astype(np.int32)
    sperm = np.argsort(senders, kind="stable").astype(np.int32)
    s_sorted = senders[sperm]
    eb = 512
    span = max(int(s_sorted[i:i + eb].max() - s_sorted[i:i + eb].min())
               for i in range(0, e, eb)) + 1
    senders_j = jnp.asarray(senders)
    sperm_j = jnp.asarray(sperm)

    out = gather_rows_st(x, senders_j, sperm_j, span)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x)[senders])

    cot = jnp.asarray(rng.normal(size=(e, w)).astype(np.float32))

    def loss_st(x):
        return jnp.sum(gather_rows_st(x, senders_j, sperm_j, span) * cot)

    def loss_ref(x):
        return jnp.sum(x[senders_j] * cot)

    g = jax.grad(loss_st)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_use_sender_sort_gate():
    """The sender-sorted gather must stay off below SENDER_SORT_MIN_E:
    default-on at bench scale regressed the epoch 27% (round-4 bisect,
    PERF_NOTES)."""
    from graph_pde_tpu.ops.segment import (use_sender_sort,
                                           SENDER_SORT_MIN_E)

    perm = jnp.arange(8)
    assert not use_sender_sort(None, 4, SENDER_SORT_MIN_E)
    assert not use_sender_sort(perm, 0, SENDER_SORT_MIN_E)
    assert not use_sender_sort(perm, 4, SENDER_SORT_MIN_E - 1)
    assert use_sender_sort(perm, 4, SENDER_SORT_MIN_E)


def test_fused_messages_sender_sort_grads_match():
    """fused_edge_messages with sender_sort must match the plain path
    on values and all gradients (the only difference is the gather's
    transpose formulation)."""
    w = 16
    rng = np.random.default_rng(5)
    n, e = 40, 512
    x = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    senders = rng.integers(0, n, size=e).astype(np.int32)
    attr = jnp.asarray(rng.normal(size=(e, 6)).astype(np.float32))
    kparams = dense_init(jax.random.PRNGKey(5), [6, 32, 32, w * w])
    sperm = np.argsort(senders, kind="stable").astype(np.int32)
    s_sorted = senders[sperm]
    span = int(s_sorted[-1] - s_sorted[0]) + 1
    ss = (jnp.asarray(sperm), span)
    senders_j = jnp.asarray(senders)

    def loss(x, attr, kp, _ss):
        msg = fused_edge_messages(x, senders_j, attr, kp, in_channels=w,
                                  out_channels=w, interpret=True,
                                  sender_sort=_ss)
        return jnp.sum(jnp.sin(msg) * msg)

    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, attr,
                                                         kparams, ss)
    v2, g2 = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, attr,
                                                         kparams, None)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
