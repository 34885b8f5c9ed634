"""Property and parity tests for graph construction."""
import numpy as np
import pytest

from graph_pde_tpu.graph import (
    Graph,
    build_graph,
    stack_graphs,
    radius_connectivity,
    forward_filter,
    torus1d_connectivity,
    torus2d_connectivity,
    edge_attributes,
    make_box_grid,
    SquareMeshGenerator,
    RandomMeshGenerator,
    RandomTwoMeshGenerator,
    RandomMultiMeshGenerator,
    simple_grid,
    grid_edge,
    grid_edge1d,
    multi_grid,
    multi_pole_grid1d,
    get_edge_attr,
)


def edges_as_set(ei):
    return set(map(tuple, np.asarray(ei).T.tolist()))


def test_radius_tree_matches_dense():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(150, 2))
    for r in (0.1, 0.25, 0.5):
        dense = radius_connectivity(pts, r, method="dense")
        tree = radius_connectivity(pts, r, method="tree")
        assert edges_as_set(dense) == edges_as_set(tree)


def test_radius_graph_properties():
    pts = make_box_grid([[0, 1], [0, 1]], [8, 8])
    ei = radius_connectivity(pts, 0.3)
    s = edges_as_set(ei)
    # self loops present (pwd <= r includes the diagonal)
    for i in range(64):
        assert (i, i) in s
    # symmetry
    for (a, b) in list(s)[:200]:
        assert (b, a) in s
    # radius correctness against dense distances
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    assert len(s) == int((d <= 0.3).sum())


def test_bipartite_radius():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(40, 2))
    b = rng.uniform(size=(25, 2))
    ei = radius_connectivity(a, 0.4, points_b=b)
    d = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    assert edges_as_set(ei) == edges_as_set(np.stack(np.where(d <= 0.4)))


def test_forward_filter():
    ei = np.array([[0, 1, 2, 3], [1, 0, 3, 3]])
    out = forward_filter(ei)
    assert (out[0] >= out[1]).all()
    assert out.shape[1] == 2  # keeps (1,0) and (3,3)


def test_torus1d():
    pts = np.linspace(0, 1, 10, endpoint=False).reshape(-1, 1)
    ei = torus1d_connectivity(pts, 0.15)
    s = edges_as_set(ei)
    assert (0, 9) in s and (9, 0) in s  # wraps around


def test_torus2d_metric_and_diffs():
    pts = make_box_grid([[0, 1], [0, 1]], [6, 6])
    # make coordinates periodic-friendly on [0,1): use 6 cells
    pts = pts * (5.0 / 6.0)
    ei, dist, xd, yd = torus2d_connectivity(pts, 0.2)
    s = edges_as_set(ei)
    # corner nodes connect across the periodic boundary
    # node 0 = (0,0), node 5 = (5/6, 0) -> periodic distance 1/6
    assert (0, 5) in s and (5, 0) in s
    # symmetric graph
    for (a, b) in list(s)[:100]:
        assert (b, a) in s
    np.testing.assert_allclose(dist, np.sqrt(xd ** 2 + yd ** 2), atol=1e-12)
    assert (dist <= 0.2 + 1e-12).all()
    # signed wrap difference: edge (0,5) has x_0 - (x_5 - 1) = 1/6
    k = np.where((ei[0] == 0) & (ei[1] == 5))[0][0]
    np.testing.assert_allclose(xd[k], 1.0 / 6.0, atol=1e-12)


def test_edge_attributes_layout():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    theta = np.array([10.0, 20.0, 30.0])
    ei = np.array([[0, 1], [2, 0]])
    attr = edge_attributes(pts, ei, theta=theta)
    np.testing.assert_allclose(
        attr, [[0, 0, 0, 1, 10, 30], [1, 0, 0, 0, 20, 10]])
    # without theta: just endpoint coords
    attr2 = edge_attributes(pts, ei)
    np.testing.assert_allclose(attr2, [[0, 0, 0, 1], [1, 0, 0, 0]])


def test_build_graph_padding_and_sort():
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    senders = np.array([2, 0, 1])
    receivers = np.array([0, 2, 1])
    attr = np.array([[1.0], [2.0], [3.0]])
    g = build_graph(x, senders, receivers, attr, n_node_pad=8, n_edge_pad=16)
    assert g.x.shape == (8, 2)
    assert g.senders.shape == (16,)
    assert int(g.n_node) == 3 and int(g.n_edge) == 3
    # sorted by receiver
    r = np.asarray(g.receivers)[:3]
    assert list(r) == sorted(r)
    # padding receivers park at N_pad - 1
    assert (np.asarray(g.receivers)[3:] == 7).all()
    # masks
    assert np.asarray(g.node_mask()).sum() == 3
    assert np.asarray(g.edge_mask()).sum() == 3


def test_stack_graphs():
    gs = []
    for i in range(4):
        x = np.full((3, 2), i, np.float32)
        g = build_graph(x, [0, 1], [1, 2], [[0.5], [0.5]],
                        n_node_pad=4, n_edge_pad=8)
        gs.append(g)
    batch = stack_graphs(gs)
    assert batch.x.shape == (4, 4, 2)
    assert batch.n_node.shape == (4,)


def test_square_mesh_generator():
    gen = SquareMeshGenerator([[0, 1], [0, 1]], [5, 5])
    assert gen.n == 25
    ei = gen.ball_connectivity(0.3)
    attr = gen.attributes(theta=np.arange(25.0))
    assert attr.shape == (ei.shape[1], 6)
    gen.get_boundary()
    bei = gen.boundary_connectivity2d(stride=2)
    assert bei.shape[0] == 2


def test_random_mesh_generator_nystrom():
    gen = RandomMeshGenerator([[0, 1], [0, 1]], [10, 10], sample_size=30,
                              seed=0)
    idx = gen.sample()
    assert idx.shape == (30,) and len(set(idx.tolist())) == 30
    ei = gen.ball_connectivity(0.25)
    assert ei.max() < 30
    attr = gen.attributes(theta=np.arange(100.0))
    assert attr.shape == (ei.shape[1], 6)
    # theta values come from the subsampled grid indices
    src0 = ei[0][0]
    assert attr[0, 4] == float(idx[src0])


def test_random_two_mesh_generator():
    gen = RandomTwoMeshGenerator([[0, 1], [0, 1]], [8, 8], 20, 10, seed=0)
    gen.sample()
    ei, ei12, ei21, ei22 = gen.ball_connectivity(0.2, 0.3, 0.5)
    assert ei.max() < 20
    assert ei12[1].min() >= 20 and ei12[1].max() < 30
    np.testing.assert_array_equal(ei21, ei12[[1, 0]])
    assert ei22.min() >= 20
    attrs = gen.attributes(theta=np.arange(64.0))
    assert attrs[0].shape[1] == 6


def test_random_multi_mesh_generator():
    m = [40, 20, 10]
    gen = RandomMultiMeshGenerator([[0, 1], [0, 1]], [10, 10], level=3,
                                   sample_sizes=m, seed=0)
    idx, idx_all = gen.sample()
    assert [len(i) for i in idx] == m
    assert len(idx_all) == 70
    ei, ei_down, ei_up = gen.ball_connectivity(
        [0.2, 0.4, 0.8], [0.15, 0.3])
    rng_mid, rng_down, rng_up = gen.get_edge_index_range()
    # per-level index ranges partition the concatenated arrays
    assert rng_mid[-1, 1] == ei.shape[1]
    assert rng_down[-1, 1] == ei_down.shape[1]
    # level-l intra edges stay within the level's node range
    offs = np.cumsum([0] + m)
    for l in range(3):
        seg = ei[:, rng_mid[l, 0]:rng_mid[l, 1]]
        assert seg.min() >= offs[l] and seg.max() < offs[l + 1]
    # down edges go level l -> l+1
    for l in range(2):
        seg = ei_down[:, rng_down[l, 0]:rng_down[l, 1]]
        assert (seg[0] >= offs[l]).all() and (seg[0] < offs[l + 1]).all()
        assert (seg[1] >= offs[l + 1]).all() and (seg[1] < offs[l + 2]).all()
    np.testing.assert_array_equal(ei_up, ei_down[[1, 0]])
    attr, attr_down, attr_up = gen.attributes(theta=np.arange(100.0))
    assert attr.shape == (ei.shape[1], 6)


def test_lattice_builders():
    X, ei, ea = simple_grid(3, 4)
    assert X.shape == (12, 2)
    # interior node count check: E = 2*(edges_h + edges_v)
    assert ei.shape[1] == 2 * ((3 - 1) * 4 + (4 - 1) * 3)
    a = np.arange(12.0)
    X2, ei2, ea2 = grid_edge(3, 4, a)
    assert ea2.shape == (ei2.shape[1], 4)
    xs, ei3, ea3 = grid_edge1d(8, np.arange(8.0))
    assert ei3.shape[1] == 32  # 4 edges per node
    s = edges_as_set(ei3)
    assert (7, 0) in s and (6, 0) in s  # periodic wrap 1-hop and 2-hop


def test_multi_grid():
    params = np.arange(64.0).reshape(1, 64)
    X, ei, ea, mask, num_nodes = multi_grid(2, 8, 8, "grid_edge", params)
    assert num_nodes == 64 + 16
    assert X.shape[0] == 80
    assert mask.shape == (64,)
    # inter-level edges connect fine nodes to their dyadic parents
    inter = ei[:, (ei[0] < 64) & (ei[1] >= 64)]
    assert inter.shape[1] == 64


def test_multi_pole_grid1d():
    s = 16
    N = 2
    theta = np.arange(N * s, dtype=np.float32).reshape(N, s, 1)
    grids, thetas, edges = multi_pole_grid1d(theta, 1, s, N, is_periodic=True)
    level = int(np.log2(s) - 1)  # 3
    assert len(grids) == level
    assert len(edges) == level + 1
    assert grids[0].shape == (16,) and grids[1].shape == (8,)
    assert thetas[1].shape == (N, 8, 1)
    # finest NN edges: periodic, degree 2 each
    assert edges[0].shape[1] == 2 * s
    # interactive edges have |dx| in {2, 3} (periodic)
    e = edges[1]
    dx = np.abs(e[0] - e[1])
    dx = np.minimum(dx, 16 - dx)
    assert ((dx >= 2) & (dx <= 3)).all()
    attr = get_edge_attr(grids[0], thetas[0][0, :, 0], edges[0])
    assert attr.shape == (edges[0].shape[1], 4)


def test_graph_vs_reference_semantics_small():
    """End-to-end check of the UAI1-style graph build on a tiny grid,
    against hand-computed dense reference math."""
    gen = SquareMeshGenerator([[0, 1], [0, 1]], [4, 4])
    ei = gen.ball_connectivity(0.35)
    theta = np.linspace(-1, 1, 16)
    attr = gen.attributes(theta=theta)
    d = np.linalg.norm(gen.grid[:, None] - gen.grid[None, :], axis=-1)
    src, dst = np.where(d <= 0.35)
    ref = np.concatenate([
        gen.grid[src], gen.grid[dst], theta[src, None], theta[dst, None]], 1)
    # same edge set; compare after canonical sort
    ours = np.concatenate([np.asarray(ei).T, attr], axis=1)
    refs = np.concatenate([np.stack([src, dst], 1), ref], axis=1)
    ours = ours[np.lexsort(ours.T[::-1])]
    refs = refs[np.lexsort(refs.T[::-1])]
    np.testing.assert_allclose(ours, refs, atol=1e-6)


def test_sender_sort_fields_through_transforms():
    """Graph.sender_perm/sender_span (scatter-free conv backward) must
    stay valid through build, repad_edges, stack_graphs, and
    flatten_stacked: the perm must sort the (padded) senders and the
    512-block span bound must hold on the sorted stream."""
    from graph_pde_tpu.graph import (build_graph, stack_graphs,
                                     repad_edges, flatten_stacked)

    rng = np.random.default_rng(0)

    def check(senders, perm, span):
        senders = np.asarray(senders)
        perm = np.asarray(perm)
        ss = senders[perm]
        assert (np.diff(ss) >= 0).all(), "perm does not sort senders"
        rb = ss.reshape(-1, 512)
        assert int((rb[:, -1] - rb[:, 0]).max()) + 1 <= span

    def make(seed, n=64, e=700):
        r = np.random.default_rng(seed)
        src = r.integers(0, n, size=e).astype(np.int32)
        dst = np.sort(r.integers(0, n, size=e).astype(np.int32))
        x = r.normal(size=(n, 3)).astype(np.float32)
        attr = r.normal(size=(e, 2)).astype(np.float32)
        return build_graph(x, src, dst, attr)

    g = make(1)
    assert g.sender_span > 0
    check(g.senders, g.sender_perm, g.sender_span)

    g2 = repad_edges(g, g.senders.shape[0] + 512)
    assert g2.sender_span > 0
    check(g2.senders, g2.sender_perm, g2.sender_span)

    stacked = stack_graphs([make(1), make(2)])
    assert stacked.sender_span > 0
    for b in range(2):
        check(stacked.senders[b], stacked.sender_perm[b],
              stacked.sender_span)

    flat = flatten_stacked(stacked)
    assert flat.sender_span == stacked.sender_span
    check(np.asarray(flat.senders), np.asarray(flat.sender_perm),
          flat.sender_span)


def test_fused_auto_gates():
    """Auto-selection in fused_edge_messages: resident iff Wl fits;
    o-major only on the resident form with in-aligned chunks (explicit
    mis-aligned chunk falls back to i-major without error)."""
    import jax
    import jax.numpy as jnp
    from graph_pde_tpu.ops import dense_init
    from graph_pde_tpu.ops.pallas_edge_conv import fused_edge_messages

    rng = np.random.default_rng(3)
    w, e, n = 16, 256, 40
    x = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
    attr = jnp.asarray(rng.normal(size=(e, 6)).astype(np.float32))
    kp = dense_init(jax.random.PRNGKey(0), [6, 32, 32, w * w])

    base = fused_edge_messages(x, senders, attr, kp, in_channels=w,
                               out_channels=w, interpret=True)
    # layout='o' with resident=False must fall back to i-major streamed
    # (o-major is implemented on the resident form only) and still match
    out = fused_edge_messages(x, senders, attr, kp, in_channels=w,
                              out_channels=w, interpret=True,
                              layout="o", resident=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=1e-5)
