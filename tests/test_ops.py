"""Ops-layer tests: edge-kernel conv parity against dense reference math
and against a torch re-implementation of NNConv_old semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_pde_tpu.ops import (
    dense_init,
    dense_apply,
    edge_kernel_conv,
    edge_conv_gaussian,
    masked_segment_mean,
    upsample_nearest_1d,
    avg_pool_1d,
)


def _random_graph(rng, n=12, extra_pad=5, w_in=8, w_out=8, a_dim=4,
                  p_edge=0.4):
    """Returns padded arrays plus the dense adjacency for oracle math."""
    adj = rng.uniform(size=(n, n)) < p_edge
    np.fill_diagonal(adj, True)
    src, dst = np.where(adj)
    order = np.lexsort((src, dst))  # sort by receiver
    src, dst = src[order], dst[order]
    e = src.size
    e_pad = e + 7
    n_pad = n + extra_pad
    senders = np.zeros(e_pad, np.int32)
    senders[:e] = src
    receivers = np.full(e_pad, n_pad - 1, np.int32)
    receivers[:e] = dst
    attr = np.zeros((e_pad, a_dim), np.float32)
    attr[:e] = rng.normal(size=(e, a_dim))
    mask = np.arange(e_pad) < e
    x = np.zeros((n_pad, w_in), np.float32)
    x[:n] = rng.normal(size=(n, w_in))
    return x, senders, receivers, attr, mask, adj, n, e


def _dense_oracle(x, senders, receivers, attr, mask, n, kparams, w_in, w_out,
                  aggr="mean", root=None, bias=None, diag=False):
    """Explicit loop reference: out_i = aggr_j x_j @ kappa(e_ji)."""
    k = np.asarray(dense_apply(kparams, jnp.asarray(attr)))
    out = np.zeros((x.shape[0], w_out), np.float64)
    cnt = np.zeros(x.shape[0], np.float64)
    for idx in range(senders.shape[0]):
        if not mask[idx]:
            continue
        j, i = senders[idx], receivers[idx]
        if diag:
            m = x[j] * k[idx]
        else:
            m = x[j] @ k[idx].reshape(w_in, w_out)
        out[i] += m
        cnt[i] += 1
    if aggr == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    if root is not None:
        out = out + x @ np.asarray(root)
    if bias is not None:
        out = out + np.asarray(bias)
    return out.astype(np.float32)


@pytest.mark.parametrize("aggr", ["mean", "add"])
def test_edge_conv_reference_matches_dense_oracle(aggr):
    rng = np.random.default_rng(0)
    w = 8
    x, s, r, a, m, adj, n, e = _random_graph(rng, w_in=w, w_out=w)
    key = jax.random.PRNGKey(0)
    kparams = dense_init(key, [4, 16, w * w])
    root = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (w, w))) * 0.1
    bias = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (w,))) * 0.1

    out = edge_kernel_conv(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(a),
        jnp.asarray(m), kparams, in_channels=w, out_channels=w, aggr=aggr,
        root=jnp.asarray(root), bias=jnp.asarray(bias), impl="reference")
    oracle = _dense_oracle(x, s, r, a, m, n, kparams, w, w, aggr=aggr,
                           root=root, bias=bias)
    np.testing.assert_allclose(np.asarray(out)[:n], oracle[:n],
                               rtol=2e-4, atol=2e-5)
    # padded nodes keep (0 + root-term + bias), never NaN
    assert np.isfinite(np.asarray(out)).all()


def test_edge_conv_scan_matches_reference():
    rng = np.random.default_rng(1)
    w = 8
    x, s, r, a, m, adj, n, e = _random_graph(rng, n=20, w_in=w, w_out=w)
    kparams = dense_init(jax.random.PRNGKey(3), [4, 16, w * w])
    args = (jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(a),
            jnp.asarray(m), kparams)
    kw = dict(in_channels=w, out_channels=w, aggr="mean")
    ref = edge_kernel_conv(*args, impl="reference", **kw)
    scan = edge_kernel_conv(*args, impl="scan", chunk_size=16, **kw)
    np.testing.assert_allclose(np.asarray(scan), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_edge_conv_diag():
    rng = np.random.default_rng(2)
    w = 6
    x, s, r, a, m, adj, n, e = _random_graph(rng, w_in=w, w_out=w)
    kparams = dense_init(jax.random.PRNGKey(4), [4, 16, w])
    out = edge_kernel_conv(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(a),
        jnp.asarray(m), kparams, in_channels=w, out_channels=w,
        kernel_type="diag", impl="reference")
    oracle = _dense_oracle(x, s, r, a, m, n, kparams, w, w, diag=True)
    np.testing.assert_allclose(np.asarray(out)[:n], oracle[:n],
                               rtol=2e-4, atol=2e-5)


def test_edge_conv_matches_torch_nnconv_old():
    """Full-stack parity with the reference NNConv_old math, re-implemented
    in torch (kernel MLP -> view(E, in, out) -> bmm -> scatter_mean -> root
    + bias), on an unpadded graph."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    w = 8
    n = 10
    adj = rng.uniform(size=(n, n)) < 0.5
    np.fill_diagonal(adj, True)
    src, dst = np.where(adj)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    e = src.size
    a = rng.normal(size=(e, 4)).astype(np.float32)
    x = rng.normal(size=(n, w)).astype(np.float32)

    kparams = dense_init(jax.random.PRNGKey(6), [4, 12, 12, w * w])
    root = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (w, w))) * 0.2
    bias = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (w,))) * 0.2

    # torch reference
    tx = torch.from_numpy(x)
    ta = torch.from_numpy(a)
    h = ta
    for i, layer in enumerate(kparams):
        h = h @ torch.from_numpy(np.asarray(layer["w"])) + torch.from_numpy(
            np.asarray(layer["b"]))
        if i != len(kparams) - 1:
            h = torch.relu(h)
    weight = h.view(-1, w, w)
    x_j = tx[torch.from_numpy(src)]
    msg = torch.matmul(x_j.unsqueeze(1), weight).squeeze(1)
    out_ref = torch.zeros(n, w)
    cnt = torch.zeros(n)
    out_ref.index_add_(0, torch.from_numpy(dst), msg)
    cnt.index_add_(0, torch.from_numpy(dst), torch.ones(e))
    out_ref = out_ref / cnt.clamp(min=1).unsqueeze(1)
    out_ref = out_ref + tx @ torch.from_numpy(root.astype(np.float32))
    out_ref = out_ref + torch.from_numpy(bias.astype(np.float32))

    out = edge_kernel_conv(
        jnp.asarray(x), jnp.asarray(src.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)), jnp.asarray(a),
        jnp.ones(e, bool), kparams, in_channels=w, out_channels=w,
        aggr="mean", root=jnp.asarray(root.astype(np.float32)),
        bias=jnp.asarray(bias.astype(np.float32)), impl="reference")
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_edge_conv_gaussian_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(9)
    w = 6
    n = 8
    src = np.repeat(np.arange(n), n)
    dst = np.tile(np.arange(n), n)
    e = src.size
    a = np.abs(rng.normal(size=(e, 3))).astype(np.float32) + 0.1
    x = rng.normal(size=(n, w)).astype(np.float32)
    lparams = dense_init(jax.random.PRNGKey(10), [1, w])

    # torch formula (nn_conv.py:174-183)
    ell = np.asarray(dense_apply(lparams, jnp.ones((1, 1)))).reshape(-1)
    aa = 1.0 / np.sqrt(np.abs(a[:, 1] * a[:, 2]) + 1e-12)
    bb = np.exp(-(a[:, 0:1] ** 2) / ell[None, :] ** 2)
    weight = aa[:, None] * bb
    msg = x[src] * weight
    out_ref = np.zeros((n, w))
    cnt = np.zeros(n)
    np.add.at(out_ref, dst, msg)
    np.add.at(cnt, dst, 1)
    out_ref = out_ref / np.maximum(cnt, 1)[:, None]

    order = np.lexsort((src, dst))
    out = edge_conv_gaussian(
        jnp.asarray(x), jnp.asarray(src[order].astype(np.int32)),
        jnp.asarray(dst[order].astype(np.int32)), jnp.asarray(a[order]),
        jnp.ones(e, bool), lparams)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4,
                               atol=1e-5)


def test_edge_conv_grad_flows():
    rng = np.random.default_rng(11)
    w = 8
    x, s, r, a, m, adj, n, e = _random_graph(rng, w_in=w, w_out=w)
    kparams = dense_init(jax.random.PRNGKey(12), [4, 16, w * w])

    def loss(kp, impl):
        out = edge_kernel_conv(
            jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), jnp.asarray(a),
            jnp.asarray(m), kp, in_channels=w, out_channels=w, impl=impl,
            chunk_size=16)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(lambda kp: loss(kp, "reference"))(kparams)
    g_scan = jax.grad(lambda kp: loss(kp, "scan"))(kparams)
    for gr, gs in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=5e-4, atol=1e-5)
        assert np.abs(np.asarray(gr)).max() > 0


def test_mean_counts_only_valid_edges():
    """A padded (masked-out) edge must not change results."""
    x = jnp.asarray(np.eye(4, 3, dtype=np.float32))
    senders = jnp.asarray([0, 1, 2], jnp.int32)
    receivers = jnp.asarray([1, 1, 3], jnp.int32)
    mask = jnp.asarray([True, True, False])
    msg = x[senders]
    out = masked_segment_mean(msg, receivers, mask, 4)
    # node 1 receives mean of x0, x1; node 3 receives nothing (masked)
    np.testing.assert_allclose(np.asarray(out)[1],
                               np.asarray((x[0] + x[1]) / 2))
    np.testing.assert_allclose(np.asarray(out)[3], 0.0)


def test_pooling_roundtrip():
    x = jnp.arange(16.0).reshape(8, 2)
    up = upsample_nearest_1d(x, 2)
    assert up.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(up[0]), np.asarray(up[1]))
    down = avg_pool_1d(up, 2)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x))


def test_dense_apply_matches_torch_densenet():
    torch = pytest.importorskip("torch")
    layers = [3, 7, 7, 5]
    params = dense_init(jax.random.PRNGKey(13), layers)
    x = np.random.default_rng(14).normal(size=(11, 3)).astype(np.float32)
    ours = np.asarray(dense_apply(params, jnp.asarray(x)))
    h = torch.from_numpy(x)
    for i, layer in enumerate(params):
        h = h @ torch.from_numpy(np.asarray(layer["w"])) + torch.from_numpy(
            np.asarray(layer["b"]))
        if i != len(params) - 1:
            h = torch.relu(h)
    np.testing.assert_allclose(ours, h.numpy(), rtol=1e-5, atol=1e-6)


def test_blocked_segment_mean_matches_flat():
    from graph_pde_tpu.graph import build_graph
    from graph_pde_tpu.ops.segment import blocked_segment_mean

    rng = np.random.default_rng(20)
    n, w = 50, 8
    src = rng.integers(0, n, size=300)
    dst = np.sort(rng.integers(0, n, size=300))
    attr = rng.normal(size=(300, 3)).astype(np.float32)
    x = rng.normal(size=(n, w)).astype(np.float32)

    g_flat = build_graph(x, src, dst, attr, n_node_pad=64)
    g_blk = build_graph(x, src, dst, attr, node_block=16,
                        edge_multiple=32)
    assert g_blk.node_block == 16
    # compute messages = gathered x; aggregate both ways
    msg_flat = np.asarray(x)[np.asarray(g_flat.senders)]
    out_flat = masked_segment_mean(
        jnp.asarray(msg_flat), g_flat.receivers, g_flat.edge_mask(),
        g_flat.x.shape[0])
    msg_blk = np.asarray(x)[np.asarray(g_blk.senders)]
    out_blk = blocked_segment_mean(
        jnp.asarray(msg_blk), jnp.asarray(g_blk.receivers),
        g_blk.edge_mask(), g_blk.x.shape[0], 16)
    np.testing.assert_allclose(np.asarray(out_blk)[:n],
                               np.asarray(out_flat)[:n], rtol=1e-5,
                               atol=1e-6)


def test_gkn_blocked_layout_matches_flat():
    from graph_pde_tpu.graph import SquareMeshGenerator, build_graph
    from graph_pde_tpu.models import GKNConfig, gkn_init, gkn_apply

    gen = SquareMeshGenerator([[0, 1], [0, 1]], [6, 6])
    ei = gen.ball_connectivity(0.3)
    rng = np.random.default_rng(21)
    theta = rng.normal(size=36).astype(np.float32)
    attr = gen.attributes(theta=theta)
    x = np.concatenate([gen.get_grid(), theta[:, None]], axis=1)

    g_flat = build_graph(x, ei[0], ei[1], attr, n_node_pad=40)
    g_blk = build_graph(x, ei[0], ei[1], attr, node_block=8,
                        edge_multiple=32)

    cfg = GKNConfig(width=8, ker_width=16, depth=2, ker_in=6, in_width=3,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(22), cfg)
    o_flat = gkn_apply(params, cfg, g_flat)
    o_blk = gkn_apply(params, cfg, g_blk)
    np.testing.assert_allclose(np.asarray(o_blk)[:36],
                               np.asarray(o_flat)[:36], rtol=1e-4,
                               atol=1e-5)


def _sorted_padded_edges(rng, n, deg, e_pad_mult=512):
    """Receiver-sorted edge list with >= deg edges per node (span per
    512-edge block stays < 64) padded at the tail to a multiple of 512."""
    dst = np.repeat(np.arange(n), deg)
    src = rng.integers(0, n, size=dst.size)
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    e = src.size
    from graph_pde_tpu.graph.graph import round_up
    e_pad = round_up(e, e_pad_mult)
    senders = np.zeros(e_pad, np.int32)
    senders[:e] = src
    receivers = np.full(e_pad, n - 1, np.int32)
    receivers[:e] = dst
    mask = np.arange(e_pad) < e
    return senders, receivers, mask, e


@pytest.mark.parametrize("mean", [True, False])
def test_sorted_block_segment_reduce_matches_scatter(mean):
    """Block-local one-hot sorted reduction (the big-N fast path for
    flat receiver-sorted layouts, ops/segment.py) vs the scatter oracle:
    values and grads."""
    from graph_pde_tpu.ops.segment import (sorted_block_segment_reduce,
                                           masked_segment_sum)

    rng = np.random.default_rng(7)
    n, w, deg = 40, 8, 30
    senders, receivers, mask, e = _sorted_padded_edges(rng, n, deg)
    data = rng.normal(size=(senders.shape[0], w)).astype(np.float32)
    data_j, recv_j = jnp.asarray(data), jnp.asarray(receivers)
    mask_j = jnp.asarray(mask)

    got = sorted_block_segment_reduce(data_j, recv_j, mask_j, n,
                                      span=64, mean=mean)
    if mean:
        want = masked_segment_mean(data_j, recv_j, mask_j, n,
                                   method="scatter")
    else:
        want = masked_segment_sum(data_j, recv_j, mask_j, n,
                                  method="scatter")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    def loss_block(d):
        return jnp.sum(sorted_block_segment_reduce(
            d, recv_j, mask_j, n, span=64, mean=mean) ** 2)

    def loss_scatter(d):
        if mean:
            o = masked_segment_mean(d, recv_j, mask_j, n, method="scatter")
        else:
            o = masked_segment_sum(d, recv_j, mask_j, n, method="scatter")
        return jnp.sum(o ** 2)

    g0 = jax.grad(loss_scatter)(data_j)
    g1 = jax.grad(loss_block)(data_j)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_sorted_block_reduce_empty_segments_and_gate():
    """Nodes with no valid edges get zeros (PyG scatter_mean parity);
    the auto gate only fires when the host-verified span flag is set,
    indices are sorted, E divides the block size, and the full one-hot
    is too big."""
    from graph_pde_tpu.ops.segment import (_use_sorted_block,
                                           sorted_block_segment_reduce)

    rng = np.random.default_rng(8)
    n = 40
    senders, receivers, mask, e = _sorted_padded_edges(rng, n, deg=30)
    # mask out every edge of node 3
    mask = mask & (receivers != 3)
    data = rng.normal(size=(senders.shape[0], 4)).astype(np.float32)
    out = sorted_block_segment_reduce(
        jnp.asarray(data), jnp.asarray(receivers), jnp.asarray(mask), n,
        span=64, mean=True)
    np.testing.assert_allclose(np.asarray(out)[3], 0.0, atol=1e-7)

    big = 10**9  # force the full one-hot gate off
    assert _use_sorted_block("auto", 64, True, 512 * 4, big)
    assert not _use_sorted_block("auto", 0, True, 512 * 4, big)
    assert not _use_sorted_block("auto", 64, False, 512 * 4, big)
    assert not _use_sorted_block("auto", 64, True, 512 * 4 + 8, big)
    assert not _use_sorted_block("auto", 64, True, 512 * 4, 16)  # one-hot wins
    # explicit blockoh needs a verified span + 512-multiple E (forcing
    # it unverified would silently drop edges — round-2 advisor finding)
    assert _use_sorted_block("blockoh", 64, False, 512, 3)
    with pytest.raises(ValueError):
        _use_sorted_block("blockoh", 0, False, 512, 3)
    with pytest.raises(ValueError):
        _use_sorted_block("blockoh", 64, False, 7, 3)


def test_build_graph_sorted_span_flag():
    """build_graph verifies the span bound host-side: dense radius-style
    graphs get the flag, low-degree graphs (span over 64 within a
    512-edge block) do not; repad and stack keep it consistent."""
    from graph_pde_tpu.graph import build_graph, stack_graphs, repad_edges

    rng = np.random.default_rng(9)
    n, deg = 48, 30
    dst = np.repeat(np.arange(n), deg)
    src = rng.integers(0, n, size=dst.size)
    attr = rng.normal(size=(dst.size, 3)).astype(np.float32)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    g = build_graph(x, src, dst, attr)
    assert g.sorted_span == 64

    # degree-2 chain: a 512-edge block spans ~256 nodes -> flag off
    n2 = 600
    dst2 = np.repeat(np.arange(n2), 2)
    src2 = rng.integers(0, n2, size=dst2.size)
    attr2 = rng.normal(size=(dst2.size, 3)).astype(np.float32)
    x2 = rng.normal(size=(n2, 4)).astype(np.float32)
    g2 = build_graph(x2, src2, dst2, attr2)
    assert g2.sorted_span == 0

    # repad keeps the bound verified on the new padding
    g3 = repad_edges(g, g.senders.shape[0] + 512)
    assert g3.sorted_span == 64

    # stacking harmonizes static aux to the min across members
    ga = build_graph(x, src, dst, attr)
    gb = ga.replace(sorted_span=0)
    stacked = stack_graphs([ga, gb])
    assert stacked.sorted_span == 0


def test_gkn_kcached_blockoh_matches_reference():
    """End-to-end GKN kcached with the sorted block-local one-hot
    aggregation forced (tiny graph, gate bypassed via method plumbing:
    shrink the one-hot budget so the auto gate picks blockoh)."""
    from graph_pde_tpu.graph import build_graph
    from graph_pde_tpu.models import GKNConfig, gkn_init, gkn_apply
    from graph_pde_tpu.ops import segment as seg

    rng = np.random.default_rng(10)
    n, deg = 48, 30
    dst = np.repeat(np.arange(n), deg)
    src = rng.integers(0, n, size=dst.size)
    attr = rng.normal(size=(dst.size, 6)).astype(np.float32)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    g = build_graph(x, src, dst, attr)
    assert g.sorted_span == 64

    cfg = GKNConfig(width=16, ker_width=32, depth=3, ker_in=6, in_width=3,
                    impl="kcached")
    params = gkn_init(jax.random.PRNGKey(40), cfg)
    o_ref = gkn_apply(params, cfg, g)

    old = seg._ONEHOT_MAX_BYTES
    seg._ONEHOT_MAX_BYTES = 0  # force the big-N branch on a tiny graph
    try:
        o_blk = gkn_apply(params, cfg, g)
    finally:
        seg._ONEHOT_MAX_BYTES = old
    np.testing.assert_allclose(np.asarray(o_blk), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)
