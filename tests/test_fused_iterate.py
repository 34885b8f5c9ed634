"""Fused contract+aggregate iteration kernel (ops/fused_iterate.py):
parity against the separate-stage kcached path (which is itself
torch-parity-tested in test_ops.py). Runs the pallas interpreter on the
CPU test backend — same code path the TPU compiles.

Reference semantics being fused: nn_conv.py:271-275 (messages then
scatter-mean) with kappa cached across the depth loop."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_pde_tpu.graph.graph import build_graph
from graph_pde_tpu.models import GKNConfig, gkn_init, gkn_apply
from graph_pde_tpu.ops.fused_iterate import (
    BLOCK_E, fused_iterate_supported, fused_iterate_total,
    sorted_iterate_setup)


def _sorted_graph(seed=0, n=30, e=200, width=16):
    """Tiny graph whose padded edge list satisfies the fused-path
    requirements (E padded to a BLOCK_E multiple; N_pad <= span bound
    so sorted_span verifies)."""
    rng = np.random.default_rng(seed)
    g = build_graph(rng.normal(size=(n, 6)).astype(np.float32),
                    rng.integers(0, n, e), rng.integers(0, n, e),
                    0.1 * rng.normal(size=(e, 6)).astype(np.float32))
    assert g.senders.shape[0] % BLOCK_E == 0
    assert g.sorted_span > 0
    return jax.tree_util.tree_map(jnp.asarray, g)


def test_fused_iterate_total_matches_dense():
    """Op-level: total[n] = sum over masked edges into n of
    xj[e] @ K[e] — checked against a dense numpy evaluation."""
    rng = np.random.default_rng(1)
    g = _sorted_graph(seed=1)
    e = g.senders.shape[0]
    w = 8
    xj = rng.normal(size=(e, w)).astype(np.float32)
    kk = rng.normal(size=(e, w * w)).astype(np.float32)
    n_pad = g.x.shape[0]
    assert fused_iterate_supported(e, w, w, g.sorted_span)

    mask = np.asarray(g.edge_mask())
    oh, ids, counts = sorted_iterate_setup(
        g.receivers, g.edge_mask(), n_pad, g.sorted_span)
    total = fused_iterate_total(
        jnp.asarray(xj), jnp.asarray(kk), oh, ids, n_pad, g.sorted_span,
        in_channels=w, out_channels=w, interpret=True)

    want = np.zeros((n_pad, w), np.float32)
    cnt = np.zeros(n_pad, np.float32)
    recv = np.asarray(g.receivers)
    for i in range(e):
        if mask[i]:
            want[recv[i]] += xj[i] @ kk[i].reshape(w, w)
            cnt[recv[i]] += 1
    np.testing.assert_allclose(np.asarray(total), want, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(counts)[:, 0],
                               np.maximum(cnt, 1.0), rtol=0, atol=0)


@pytest.mark.parametrize("k_storage", [None, "float8_e4m3"])
def test_gkn_fused_matches_staged(k_storage):
    """Model-level: kcached_fused='on' (fused pallas iteration) must
    match kcached_fused='off' (separate XLA stages) in forward and in
    every parameter gradient."""
    g = _sorted_graph(seed=2)
    base = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6,
                     in_width=6, impl="kcached", k_storage=k_storage)
    params = gkn_init(jax.random.PRNGKey(0), base)
    c_off = dataclasses.replace(base, kcached_fused="off")
    c_on = dataclasses.replace(base, kcached_fused="on")

    o_off = gkn_apply(params, c_off, g)
    o_on = gkn_apply(params, c_on, g)
    # fp8: both paths see identically-quantized K values; the staged
    # path stores them in bf16 (bf16 product rounding) while the fused
    # kernel multiplies in f32 — small representational skew.
    tol = dict(rtol=2e-2, atol=2e-2) if k_storage else \
        dict(rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_on), np.asarray(o_off), **tol)

    def loss(p, cfg):
        out = gkn_apply(p, cfg, g)
        return jnp.sum(out ** 2)

    g_off = jax.grad(lambda p: loss(p, c_off))(params)
    g_on = jax.grad(lambda p: loss(p, c_on))(params)
    for k_on, k_off in zip(jax.tree_util.tree_leaves(g_on),
                           jax.tree_util.tree_leaves(g_off)):
        denom = np.abs(np.asarray(k_off)).max() + 1e-6
        rel = np.abs(np.asarray(k_on) - np.asarray(k_off)).max() / denom
        assert rel < (5e-2 if k_storage else 1e-4), rel


def test_gkn_fused_aggr_add():
    """aggr='add' skips the count division in both paths."""
    g = _sorted_graph(seed=3)
    base = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6,
                     in_width=6, impl="kcached", aggr="add")
    params = gkn_init(jax.random.PRNGKey(1), base)
    o_off = gkn_apply(params,
                      dataclasses.replace(base, kcached_fused="off"), g)
    o_on = gkn_apply(params,
                     dataclasses.replace(base, kcached_fused="on"), g)
    np.testing.assert_allclose(np.asarray(o_on), np.asarray(o_off),
                               rtol=1e-4, atol=1e-5)
