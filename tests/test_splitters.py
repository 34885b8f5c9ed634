"""Splitter tests: coverage, assembly correctness, model integration."""
import numpy as np
import jax
import pytest

from graph_pde_tpu.graph import (
    RandomGridSplitter,
    RandomMultiMeshSplitter,
    DownsampleGridSplitter,
    TorusGridSplitter,
    make_box_grid,
)


def test_random_grid_splitter_roundtrip():
    s = 8
    grid = make_box_grid([[0, 1], [0, 1]], [s, s])
    sp = RandomGridSplitter(grid, s, d=2, m=16, l=2, radius=0.3, seed=0)
    theta = np.random.default_rng(0).normal(size=(64, 1)).astype(np.float32)
    graphs = sp.get_data(theta)
    assert len(graphs) == sp.num * sp.l == 8
    # identity oracle: "predict" each node's own grid index
    preds, idxs = [], []
    for g in graphs:
        idx = np.asarray(g.sample_idx)[:16]
        preds.append(idx.astype(np.float32))
        idxs.append(idx)
    out = sp.assemble(preds, idxs)
    np.testing.assert_allclose(out, np.arange(64, dtype=np.float32))


def test_random_multimesh_splitter_covers_grid():
    sp = RandomMultiMeshSplitter([[0, 1], [0, 1]], [8, 8], level=2,
                                 sample_sizes=[24, 12], seed=0)
    theta_a = np.random.default_rng(1).normal(size=64).astype(np.float32)
    theta_all = theta_a[:, None]
    graphs, caps = sp.splitter([0.3, 0.6], [0.2], theta_a, theta_all)
    assert len(graphs) == sp.splits
    # union of finest-level sample_idx covers every grid node
    cover = np.concatenate([np.asarray(g.sample_idx) for g in graphs])
    assert set(cover.tolist()) == set(range(64))
    # assembler writes each node
    outs = [np.asarray(g.sample_idx, np.float32) for g in graphs]
    idxs = [np.asarray(g.sample_idx) for g in graphs]
    pred = sp.assembler(outs, idxs)
    np.testing.assert_allclose(pred, np.arange(64, dtype=np.float32))


def test_multimesh_sample_ring_windows():
    """sample() walks consecutive circular windows of one fixed
    permutation: levels are disjoint until the walk wraps, the union
    window equals their concatenation, and a wrapped window stitches
    tail + head of the permutation (mp/utilities.py:829-856 semantics)."""
    sp = RandomMultiMeshSplitter([[0, 1], [0, 1]], [8, 8], level=2,
                                 sample_sizes=[24, 12], seed=3)
    idx, union = sp.sample(new_sample=True, index0=0)
    assert [len(a) for a in idx] == [24, 12]
    assert len(union) == 36
    np.testing.assert_array_equal(np.concatenate(idx), union)
    assert len(set(union.tolist())) == 36  # disjoint windows
    np.testing.assert_array_equal(union, sp.perm[:36])
    # wrapped window: start near the end of the 64-entry permutation
    idx2, union2 = sp.sample(new_sample=False, index0=60)
    np.testing.assert_array_equal(
        idx2[0], np.concatenate([sp.perm[60:], sp.perm[:20]]))
    np.testing.assert_array_equal(union2[:4], sp.perm[60:])
    assert len(union2) == 36
    # a window spanning exactly the whole permutation returns all of it
    sp2 = RandomMultiMeshSplitter([[0, 1], [0, 1]], [4, 4], level=2,
                                  sample_sizes=[12, 4], seed=0)
    _, union3 = sp2.sample(new_sample=True, index0=5)
    assert sorted(union3.tolist()) == list(range(16))


def test_multimesh_splitter_graphs_run_through_model():
    from graph_pde_tpu.models import (
        MGKNGeneralConfig, mgkn_general_init, mgkn_general_apply,
    )

    sp = RandomMultiMeshSplitter([[0, 1], [0, 1]], [8, 8], level=2,
                                 sample_sizes=[24, 12], seed=0)
    theta_a = np.random.default_rng(1).normal(size=64).astype(np.float32)
    graphs, caps = sp.splitter([0.3, 0.6], [0.2], theta_a, theta_a[:, None])
    cfg = MGKNGeneralConfig(width=8, ker_width=16, depth=1, ker_in=6,
                            in_width=3, points=(24, 12), impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(0), cfg)
    out = mgkn_general_apply(params, cfg, graphs[0])
    assert out.shape == (24, 1)


@pytest.mark.parametrize("resolution", [16, 15])
def test_downsample_grid_splitter(resolution):
    grid = make_box_grid([[0, 1], [0, 1]], [resolution, resolution])
    m = 80
    sp = DownsampleGridSplitter(grid, resolution, r=2, m=m, radius=0.3,
                                seed=0)
    theta = np.random.default_rng(2).normal(
        size=(resolution ** 2, 1)).astype(np.float32)
    shards = sp.get_data(theta)
    assert len(shards) == 4
    # assemble identity: feed each shard's true sub-grid values
    field = np.arange(resolution ** 2, dtype=np.float32)
    preds, xys = [], []
    for g, xy in shards:
        idx = np.asarray(g.sample_idx)
        preds.append(field[idx][:m])
        xys.append(xy)
    out = sp.assemble(preds, xys, sigma=1e-9)
    # with near-zero smoothing the assembly is exact
    np.testing.assert_allclose(out, field, atol=1e-4)
    # training-side sample
    Y = np.random.default_rng(3).normal(size=resolution ** 2)
    g, xy = sp.sample(theta, Y)
    assert g.y is not None


def test_torus_grid_splitter_and_time_series():
    resolution = 16
    grid = make_box_grid([[0, 1], [0, 1]], [resolution, resolution])
    # periodic-friendly coordinates on [0, 1)
    grid = grid * (resolution - 1) / resolution
    T = 3
    sp = TorusGridSplitter(grid, resolution, r=2, m=80, radius=0.2, T=T,
                           seed=0)
    theta = np.random.default_rng(4).normal(
        size=(resolution ** 2, 1)).astype(np.float32)
    shards = sp.get_data(theta)
    assert len(shards) == 4
    g0, xy0 = shards[0]
    # torus edge attrs: [dx, dy, dist, a_i, a_j]
    assert g0.edge_attr.shape[1] == 5
    attr = np.asarray(g0.edge_attr)[np.asarray(g0.edge_mask())]
    np.testing.assert_allclose(
        attr[:, 2], np.sqrt(attr[:, 0] ** 2 + attr[:, 1] ** 2), atol=1e-5)

    Y = np.random.default_rng(5).normal(size=(T, resolution ** 2))
    g, xy = sp.sampleT(theta, Y)
    assert g.y.shape[1] == T

    # assembleT identity
    field_t = np.stack([np.arange(resolution ** 2, dtype=np.float32) + t
                        for t in range(T)])
    preds, xys = [], []
    for g, xy in shards:
        idx = np.asarray(g.sample_idx)
        preds.append(field_t[:, idx][:, :80].T)
        xys.append(xy)
    out = sp.assembleT(preds, xys, sigma=1e-9)
    np.testing.assert_allclose(out, field_t, atol=1e-4)
