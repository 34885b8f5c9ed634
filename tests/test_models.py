"""Model-layer tests: shapes, jit, grads, padding invariance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_pde_tpu.graph import (
    SquareMeshGenerator,
    RandomMultiMeshGenerator,
    build_graph,
    build_multilevel_graph,
    stack_graphs,
    multi_pole_grid1d,
    get_edge_attr,
)
from graph_pde_tpu.models import (
    GKNConfig, gkn_init, gkn_apply, gkn_apply_batched,
    MGKNGeneralConfig, mgkn_general_init, mgkn_general_apply,
    MultipoleGraph1D, MGKNOrthogonalConfig, mgkn_orthogonal_init,
    mgkn_orthogonal_apply,
    GCNConfig, gcn_init, gcn_apply,
)
from graph_pde_tpu.models.gcn import gcn_conv


def _tiny_gkn_graph(n_edge_pad=None, seed=0):
    gen = SquareMeshGenerator([[0, 1], [0, 1]], [5, 5])
    ei = gen.ball_connectivity(0.3)
    rng = np.random.default_rng(seed)
    theta = rng.normal(size=25).astype(np.float32)
    attr = gen.attributes(theta=theta)
    x = np.concatenate([gen.get_grid(), theta[:, None]], axis=1)
    y = rng.normal(size=(25, 1)).astype(np.float32)
    return build_graph(x, ei[0], ei[1], attr, y=y, n_node_pad=32,
                       n_edge_pad=n_edge_pad)


def test_gkn_forward_shapes_and_jit():
    cfg = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6, in_width=3)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    g = _tiny_gkn_graph()
    out = jax.jit(lambda p, g: gkn_apply(p, cfg, g))(params, g)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_gkn_padding_invariance():
    """Growing the edge capacity must not change valid-node outputs."""
    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=3)
    params = gkn_init(jax.random.PRNGKey(1), cfg)
    g1 = _tiny_gkn_graph()
    g2 = _tiny_gkn_graph(n_edge_pad=g1.senders.shape[0] + 512)
    o1 = gkn_apply(params, cfg, g1)
    o2 = gkn_apply(params, cfg, g2)
    np.testing.assert_allclose(np.asarray(o1)[:25], np.asarray(o2)[:25],
                               rtol=1e-5, atol=1e-6)


def test_gkn_variants():
    g = _tiny_gkn_graph()
    # KernelNN3 (no relu after last conv) + MLP decoder (neurips5)
    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=3,
                    kernel_layers=GKNConfig.kernel_nn3_layers(6, 32, 16),
                    relu_last=False, decoder_mlp=True)
    params = gkn_init(jax.random.PRNGKey(2), cfg)
    assert "fc3" in params
    out = gkn_apply(params, cfg, g)
    assert out.shape == (32, 1)


def test_gkn_grad_and_batched():
    cfg = GKNConfig(width=8, ker_width=16, depth=2, ker_in=6, in_width=3)
    params = gkn_init(jax.random.PRNGKey(3), cfg)
    graphs = stack_graphs([_tiny_gkn_graph(seed=i) for i in range(3)])

    def loss(p):
        out = gkn_apply_batched(p, cfg, graphs)
        mask = jax.vmap(lambda g: g.node_mask())(graphs)
        return jnp.sum((out[..., 0] * mask - graphs.y[..., 0] * mask) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def _tiny_multilevel(seed=0, caps=None):
    m = [30, 15, 8]
    gen = RandomMultiMeshGenerator([[0, 1], [0, 1]], [8, 8], level=3,
                                   sample_sizes=m, seed=seed)
    idx, idx_all = gen.sample()
    gen.ball_connectivity([0.25, 0.5, 1.0], [0.15, 0.3])
    rng = np.random.default_rng(seed)
    theta = rng.normal(size=64).astype(np.float32)
    attr, attr_down, attr_up = gen.attributes(theta=theta)
    grids, grid_all = gen.get_grid()
    x = np.concatenate([grid_all, theta[idx_all][:, None]], axis=1)
    y = rng.normal(size=(m[0], 1)).astype(np.float32)
    # split concatenated attrs back into per-level lists
    rng_mid, rng_down, rng_up = gen.get_edge_index_range()
    mid_attrs = [attr[rng_mid[l, 0]:rng_mid[l, 1]] for l in range(3)]
    down_attrs = [attr_down[rng_down[l, 0]:rng_down[l, 1]] for l in range(2)]
    up_attrs = [attr_up[rng_up[l, 0]:rng_up[l, 1]] for l in range(2)]
    kw = {}
    if caps is not None:
        kw = dict(mid_caps=caps[0], down_caps=caps[1], up_caps=caps[2])
    return build_multilevel_graph(
        x, m, gen.edge_index, mid_attrs, gen.edge_index_down, down_attrs,
        gen.edge_index_up, up_attrs, y=y, sample_idx=idx[0], **kw)


@pytest.mark.parametrize("variant", ["mkgn", "induced"])
def test_mgkn_general_forward(variant):
    g = _tiny_multilevel()
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=2, ker_in=6,
                            in_width=3, points=(30, 15, 8), variant=variant)
    params = mgkn_general_init(jax.random.PRNGKey(4), cfg)
    out = jax.jit(lambda p, g: mgkn_general_apply(p, cfg, g))(params, g)
    assert out.shape == (30, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_mgkn_general_padding_invariance():
    g1 = _tiny_multilevel()
    # regenerate identical graph with larger capacities
    caps = (tuple(r[1] - r[0] + 256 for r in g1.mid_ranges),
            tuple(r[1] - r[0] + 256 for r in g1.down_ranges),
            tuple(r[1] - r[0] + 256 for r in g1.up_ranges))
    g2 = _tiny_multilevel(caps=caps)
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=2, ker_in=6,
                            in_width=3, points=(30, 15, 8))
    params = mgkn_general_init(jax.random.PRNGKey(5), cfg)
    o1 = mgkn_general_apply(params, cfg, g1)
    o2 = mgkn_general_apply(params, cfg, g2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5,
                               atol=1e-6)


def test_mgkn_general_grad():
    g = _tiny_multilevel()
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=1, ker_in=6,
                            in_width=3, points=(30, 15, 8))
    params = mgkn_general_init(jax.random.PRNGKey(6), cfg)

    def loss(p):
        return jnp.sum(mgkn_general_apply(p, cfg, g) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every conv kernel receives gradient
    for l in range(3):
        gk = grads["conv_mid"][l]["kernel"]
        assert np.abs(np.asarray(gk[0]["w"])).max() > 0


def _tiny_multipole1d(s=16, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.normal(size=(1, s, 1)).astype(np.float32)
    grids, thetas, edges = multi_pole_grid1d(theta, 1, s, 1,
                                             is_periodic=True)
    attrs = []
    senders, receivers = [], []
    level = len(grids)
    for i, e in enumerate(edges):
        # edge i belongs to level max(i-1, 0) grid size
        li = max(i - 1, 0)
        attrs.append(jnp.asarray(
            get_edge_attr(grids[li], thetas[li][0, :, 0], e)))
        senders.append(jnp.asarray(e[0], jnp.int32))
        receivers.append(jnp.asarray(e[1], jnp.int32))
    x = np.stack([grids[0], thetas[0][0, :, 0]], axis=1)
    y = rng.normal(size=(s, 1)).astype(np.float32)
    return MultipoleGraph1D(x=jnp.asarray(x), senders=senders,
                            receivers=receivers, attrs=attrs,
                            y=jnp.asarray(y))


def test_mgkn_orthogonal_forward_and_grad():
    s = 16
    g = _tiny_multipole1d(s)
    cfg = MGKNOrthogonalConfig(width=8, ker_width=32, depth=2, ker_in=4,
                               in_width=2, s=s)
    assert cfg.level == 3
    params = mgkn_orthogonal_init(jax.random.PRNGKey(7), cfg)
    assert len(params["conv"]) == 4
    out = jax.jit(lambda p, g: mgkn_orthogonal_apply(p, cfg, g))(params, g)
    assert out.shape == (s, 1)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.sum((mgkn_orthogonal_apply(p, cfg, g) - g.y) ** 2)

    grads = jax.grad(loss)(params)
    for l in range(4):
        assert np.abs(np.asarray(grads["conv"][l]["kernel"][0]["w"])).max() > 0


def test_gcn_conv_matches_dense_math():
    rng = np.random.default_rng(8)
    n = 7
    adj = rng.uniform(size=(n, n)) < 0.4
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    src, dst = np.where(adj)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    x = rng.normal(size=(n, 5)).astype(np.float32)
    w = rng.normal(size=(5, 4)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)

    out = gcn_conv(jnp.asarray(x), jnp.asarray(src, jnp.int32),
                   jnp.asarray(dst, jnp.int32),
                   jnp.ones(src.size, bool), {"w": w, "b": b}, n)

    # dense reference: D^-1/2 (A+I) D^-1/2 X W + b
    a_hat = adj.astype(np.float64) + np.eye(n)
    d = a_hat.sum(1)
    d_inv = np.diag(1.0 / np.sqrt(d))
    ref = d_inv @ a_hat @ d_inv @ (x @ w) + b
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gcn_model_forward():
    g = _tiny_gkn_graph()
    cfg = GCNConfig(width=16, ker_width=32, depth=2, in_width=3)
    params = gcn_init(jax.random.PRNGKey(9), cfg)
    out = gcn_apply(params, cfg, g)
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_mgkn_variant_single_ignores_coarse_levels():
    """neurips2_MGKN.py:74-78 shipped forward: only K_00 runs — the
    coarse levels are present in the graph but must not influence the
    output; kcached must agree with the reference impl."""
    import dataclasses as dc

    g = _tiny_multilevel()
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=2, ker_in=6,
                            in_width=3, points=(30, 15, 8),
                            variant="single", impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(4), cfg)
    out = mgkn_general_apply(params, cfg, g)
    assert out.shape == (30, 1)
    assert np.isfinite(np.asarray(out)).all()
    x2 = np.asarray(g.x).copy()
    x2[30:] += 100.0  # perturb every coarse-level node feature
    out2 = mgkn_general_apply(params, cfg, g.replace(x=jnp.asarray(x2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)
    out_kc = mgkn_general_apply(params, dc.replace(cfg, impl="kcached"), g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_kc),
                               rtol=2e-3, atol=2e-4)


def test_gcn_blocked_and_template_parity():
    """Blocked-CSR aggregation and the shared-template NodeBatch layout
    (neurips4 full-grid lattice) must match the flat per-sample path."""
    from graph_pde_tpu.graph import grid_edge, build_graph
    from graph_pde_tpu.graph.graph import NodeBatch
    from graph_pde_tpu.train import GCNTask

    s = 8
    n = s * s
    X, ei, _ = grid_edge(s, s)
    ea = np.zeros((ei.shape[1], 1), np.float32)
    rng = np.random.default_rng(0)
    cfg = GCNConfig(width=8, ker_width=16, depth=2, in_width=6)
    params = gcn_init(jax.random.PRNGKey(1), cfg)
    feats = rng.normal(size=(2, n, 6)).astype(np.float32)

    g_flat = build_graph(feats[0], ei[0], ei[1], ea)
    g_blk = build_graph(feats[0], ei[0], ei[1], ea, node_block=16)
    o_flat = gcn_apply(params, cfg, g_flat)
    o_blk = gcn_apply(params, cfg, g_blk)
    np.testing.assert_allclose(np.asarray(o_flat)[:n],
                               np.asarray(o_blk)[:n], rtol=2e-3,
                               atol=1e-4)

    n_pad = g_blk.num_nodes_padded
    xs = np.zeros((2, n_pad, 6), np.float32)
    xs[:, :n] = feats
    batch = NodeBatch(x=jnp.asarray(xs),
                      y=jnp.zeros((2, n_pad, 1), jnp.float32),
                      n_node=jnp.full((2,), n, jnp.int32))
    task = GCNTask(cfg, template=g_blk.replace(
        x=jnp.zeros((n_pad, 6), jnp.float32)))
    out_b = task.forward(params, batch)
    for j in range(2):
        gj = build_graph(feats[j], ei[0], ei[1], ea, node_block=16)
        oj = gcn_apply(params, cfg, gj)
        np.testing.assert_allclose(np.asarray(out_b[j])[:n],
                                   np.asarray(oj)[:n], rtol=2e-3,
                                   atol=1e-4)


def test_mgkn_single_level():
    """neurips2_MGKN-style single-level ablation: no inter-level edges."""
    from graph_pde_tpu.graph import RandomMultiMeshGenerator, \
        build_multilevel_graph

    gen = RandomMultiMeshGenerator([[0, 1], [0, 1]], [8, 8], level=1,
                                   sample_sizes=[30], seed=0)
    idx, idx_all = gen.sample()
    gen.ball_connectivity([0.3], [])
    rng = np.random.default_rng(0)
    theta = rng.normal(size=64).astype(np.float32)
    attr, attr_down, attr_up = gen.attributes(theta=theta)
    assert attr_down.shape[0] == 0
    x = np.concatenate([gen.grid_sample_all,
                        theta[idx_all][:, None]], axis=1)
    g = build_multilevel_graph(x, [30], gen.edge_index, [attr], [], [],
                               [], [], y=rng.normal(size=(30, 1)))
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=2, ker_in=6,
                            in_width=3, points=(30,), variant="induced",
                            impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(0), cfg)
    out = mgkn_general_apply(params, cfg, g)
    assert out.shape == (30, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_gkn_kcached_matches_reference_impl():
    """impl='kcached' (kernel matrices computed once, reused across depth)
    must equal the per-iteration implementations."""
    import dataclasses
    g = _tiny_gkn_graph()
    cfg_ref = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6,
                        in_width=3, impl="reference")
    params = gkn_init(jax.random.PRNGKey(30), cfg_ref)
    cfg_kc = dataclasses.replace(cfg_ref, impl="kcached")
    o_ref = gkn_apply(params, cfg_ref, g)
    o_kc = gkn_apply(params, cfg_kc, g)
    np.testing.assert_allclose(np.asarray(o_kc), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)
    # grads too
    g_ref = jax.grad(lambda p: jnp.sum(gkn_apply(p, cfg_ref, g) ** 2))(params)
    g_kc = jax.grad(lambda p: jnp.sum(gkn_apply(p, cfg_kc, g) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_kc)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("relu_last,root_weight,use_bias,aggr", [
    (True, True, True, "mean"),
    (False, True, True, "mean"),
    (True, False, False, "mean"),
    (True, True, True, "add"),
])
def test_gkn_kcached_loop_vjp_parity(relu_last, root_weight, use_bias,
                                     aggr):
    """The loop-level custom VJP (ops/kcached_loop.py, opt-in — measured
    slower than plain autodiff end-to-end, see its docstring) must match
    plain-autodiff kcached in forward values and parameter gradients."""
    import dataclasses
    g = _tiny_gkn_graph()
    cfg = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6, in_width=3,
                    impl="kcached", relu_last=relu_last,
                    root_weight=root_weight, use_bias=use_bias, aggr=aggr,
                    loop_vjp=False)
    cfg_lv = dataclasses.replace(cfg, loop_vjp=True)
    params = gkn_init(jax.random.PRNGKey(33), cfg)
    o0 = gkn_apply(params, cfg, g)
    o1 = gkn_apply(params, cfg_lv, g)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-6)

    def loss(c):
        return lambda p: jnp.sum(gkn_apply(p, c, g) ** 2)

    g0 = jax.grad(loss(cfg))(params)
    g1 = jax.grad(loss(cfg_lv))(params)
    for (k0, a), (k1, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g0),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g1),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=str(k0))


def test_gkn_kcached_loop_vjp_batched_jit():
    """loop-VJP under vmap (stacked batch) + jit + grad."""
    import dataclasses
    cfg = GKNConfig(width=8, ker_width=16, depth=2, ker_in=6, in_width=3,
                    impl="kcached", loop_vjp=True)
    params = gkn_init(jax.random.PRNGKey(34), cfg)
    graphs = stack_graphs([_tiny_gkn_graph(seed=i) for i in range(3)])

    @jax.jit
    def loss(p):
        out = gkn_apply_batched(p, cfg, graphs)
        mask = jax.vmap(lambda g: g.node_mask())(graphs)
        return jnp.sum((out[..., 0] * mask - graphs.y[..., 0] * mask) ** 2)

    l, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    cfg0 = dataclasses.replace(cfg, loop_vjp=False)

    @jax.jit
    def loss0(p):
        out = gkn_apply_batched(p, cfg0, graphs)
        mask = jax.vmap(lambda g: g.node_mask())(graphs)
        return jnp.sum((out[..., 0] * mask - graphs.y[..., 0] * mask) ** 2)

    l0, grads0 = jax.value_and_grad(loss0)(params)
    np.testing.assert_allclose(float(l), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads0),
                    jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_mgkn_kcached_parity():
    import dataclasses
    g = _tiny_multilevel()
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=2, ker_in=6,
                            in_width=3, points=(30, 15, 8),
                            impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(31), cfg)
    o_ref = mgkn_general_apply(params, cfg, g)
    o_kc = mgkn_general_apply(
        params, dataclasses.replace(cfg, impl="kcached"), g)
    np.testing.assert_allclose(np.asarray(o_kc), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)

    # orthogonal variant
    s = 16
    go = _tiny_multipole1d(s)
    cfg_o = MGKNOrthogonalConfig(width=8, ker_width=32, depth=2, ker_in=4,
                                 in_width=2, s=s, impl="reference")
    params_o = mgkn_orthogonal_init(jax.random.PRNGKey(32), cfg_o)
    o1 = mgkn_orthogonal_apply(params_o, cfg_o, go)
    o2 = mgkn_orthogonal_apply(
        params_o, dataclasses.replace(cfg_o, impl="kcached"), go)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-4, atol=1e-5)


def test_gkn_flatten_batch_parity():
    """batch_mode='flatten' (one disjoint-union graph per batch, the
    reference DataLoader's layout, UAI1_full_resolution.py:223) must
    match the vmapped stacked forward exactly on valid nodes, for both
    the reference and kcached paths — including ragged valid counts and
    gradient flow."""
    import dataclasses

    rng = np.random.default_rng(7)
    gs = []
    for i in range(3):
        n = 18 + 3 * i
        e = 50 + 11 * i
        s = rng.integers(0, n, e)
        r = rng.integers(0, n, e)
        gs.append(build_graph(
            rng.normal(size=(n, 6)), s, r, rng.normal(size=(e, 6)),
            y=rng.normal(size=(n,)), n_node_pad=32, n_edge_pad=512))
    batch = jax.tree_util.tree_map(jnp.asarray, stack_graphs(gs))
    valid = np.arange(32)[None] < np.asarray(batch.n_node)[:, None]

    base = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6, in_width=6)
    params = gkn_init(jax.random.PRNGKey(0), base)
    for impl in ("reference", "kcached"):
        c_v = dataclasses.replace(base, impl=impl, batch_mode="vmap")
        c_f = dataclasses.replace(base, impl=impl, batch_mode="flatten")
        o_v = gkn_apply_batched(params, c_v, batch)
        o_f = jax.jit(
            lambda p, b: gkn_apply_batched(p, c_f, b))(params, batch)
        assert o_f.shape == o_v.shape
        np.testing.assert_allclose(
            np.asarray(o_f)[valid], np.asarray(o_v)[valid],
            rtol=1e-5, atol=1e-6)

        def loss(p, cfg=c_f):
            out = gkn_apply_batched(p, cfg, batch)
            return jnp.sum((out[..., 0] * valid) ** 2)

        g_f = jax.grad(loss)(params)
        g_v = jax.grad(lambda p: loss(p, c_v))(params)
        for kf, kv in zip(jax.tree_util.tree_leaves(g_f),
                          jax.tree_util.tree_leaves(g_v)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(kv),
                                       rtol=1e-4, atol=1e-5)


def test_gkn_kcached_fp8_storage():
    """k_storage='float8_e4m3' (fp8 storage of the cached kernel
    matrices, upcast to bf16 at use) must stay within fp8 quantization
    error of the f32 kcached forward and produce finite grads."""
    import dataclasses

    rng = np.random.default_rng(3)
    n, e = 30, 200
    g = build_graph(rng.normal(size=(n, 6)), rng.integers(0, n, e),
                    rng.integers(0, n, e),
                    0.1 * rng.normal(size=(e, 6)))
    cfg = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6,
                    in_width=6, impl="kcached")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    o_ref = gkn_apply(params, cfg, g)
    for ks in ("float8_e4m3", "float8_e5m2"):
        c8 = dataclasses.replace(cfg, k_storage=ks)
        o8 = gkn_apply(params, c8, g)
        rel = (np.abs(np.asarray(o8) - np.asarray(o_ref)).max()
               / (np.abs(np.asarray(o_ref)).max() + 1e-12))
        # e4m3 has ~6% relative quantization, e5m2 ~25%; depth-3
        # composition stays within these loose bounds on smooth data
        assert rel < (0.15 if ks == "float8_e4m3" else 0.4), (ks, rel)
        grads = jax.grad(
            lambda p: jnp.sum(gkn_apply(p, c8, g) ** 2))(params)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


def test_mgkn_kcached_fp8_storage():
    """k_storage fp8-STE on both MGKN families: forward within fp8
    quantization error of the plain kcached forward, finite grads
    (mirrors test_gkn_kcached_fp8_storage; the depth V-cycles are
    unrolled Python loops, the STE's validity condition)."""
    import dataclasses

    g = _tiny_multilevel()
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=2, ker_in=6,
                            in_width=3, points=(30, 15, 8),
                            impl="kcached")
    params = mgkn_general_init(jax.random.PRNGKey(41), cfg)
    o_ref = mgkn_general_apply(params, cfg, g)
    c8 = dataclasses.replace(cfg, k_storage="float8_e4m3")
    o8 = mgkn_general_apply(params, c8, g)
    rel = (np.abs(np.asarray(o8) - np.asarray(o_ref)).max()
           / (np.abs(np.asarray(o_ref)).max() + 1e-12))
    assert rel < 0.15, rel
    grads = jax.grad(
        lambda p: jnp.sum(mgkn_general_apply(p, c8, g) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()

    s = 16
    go = _tiny_multipole1d(s)
    cfg_o = MGKNOrthogonalConfig(width=8, ker_width=32, depth=2, ker_in=4,
                                 in_width=2, s=s, impl="kcached")
    params_o = mgkn_orthogonal_init(jax.random.PRNGKey(42), cfg_o)
    o1 = mgkn_orthogonal_apply(params_o, cfg_o, go)
    c8_o = dataclasses.replace(cfg_o, k_storage="float8_e4m3")
    o2 = mgkn_orthogonal_apply(params_o, c8_o, go)
    rel = (np.abs(np.asarray(o2) - np.asarray(o1)).max()
           / (np.abs(np.asarray(o1)).max() + 1e-12))
    assert rel < 0.15, rel
    grads_o = jax.grad(
        lambda p: jnp.sum(mgkn_orthogonal_apply(p, c8_o, go) ** 2))(params_o)
    for leaf in jax.tree_util.tree_leaves(grads_o):
        assert np.isfinite(np.asarray(leaf)).all()
