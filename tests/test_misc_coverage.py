"""Coverage for smaller components: sin MLP, gaussian connectivity,
prefetch iterator, forward-filtered graphs, boundary edges."""
import numpy as np
import jax
import jax.numpy as jnp

from graph_pde_tpu.ops import dense_init, dense_sin_apply
from graph_pde_tpu.graph import (SquareMeshGenerator, RandomMeshGenerator,
                                 gaussian_connectivity)
from graph_pde_tpu.data import batch_iterator, prefetch_to_device


def test_dense_sin_apply():
    """DenseNet_sin semantics (utilities.py:233-252): sin between layers,
    linear output."""
    params = dense_init(jax.random.PRNGKey(0), [3, 8, 5])
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)),
                    jnp.float32)
    out = dense_sin_apply(params, x)
    ref = jnp.sin(x @ params[0]["w"] + params[0]["b"]) @ params[1]["w"] \
        + params[1]["b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_gaussian_connectivity_statistics():
    """Bernoulli-RBF random graph (utilities.py:283-289): self-pairs have
    rbf=1 (always included); far pairs rarely."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(60, 2))
    ei = gaussian_connectivity(pts, sigma=0.1, rng=np.random.default_rng(1))
    s = set(map(tuple, ei.T.tolist()))
    for i in range(60):
        assert (i, i) in s  # rbf(0) = 1
    # density decreases with distance
    d = np.linalg.norm(pts[ei[0]] - pts[ei[1]], axis=1)
    assert np.median(d) < 0.3


def test_mesh_generator_gaussian_connectivity():
    gen = SquareMeshGenerator([[0, 1], [0, 1]], [6, 6])
    ei = gen.gaussian_connectivity(0.2, rng=np.random.default_rng(2))
    assert ei.shape[0] == 2 and ei.shape[1] >= 36
    attr = gen.attributes(theta=np.arange(36.0))
    assert attr.shape[0] == ei.shape[1]


def test_random_mesh_forward_filter_and_custom_f():
    gen = RandomMeshGenerator([[0, 1], [0, 1]], [8, 8], sample_size=20,
                              seed=3)
    gen.sample()
    ei = gen.ball_connectivity(0.4, is_forward=True)
    assert (ei[0] >= ei[1]).all()
    # custom attribute function f(x_i, x_j, th_i, th_j)
    attr = gen.attributes(
        f=lambda xi, xj, ti, tj: np.linalg.norm(xi - xj, axis=1,
                                                keepdims=True),
        theta=np.arange(64.0))
    assert attr.shape == (ei.shape[1], 1)
    assert (attr >= 0).all()


def test_boundary_edges_run_through_attrs():
    gen = SquareMeshGenerator([[0, 1], [0, 1]], [5, 5])
    gen.get_boundary()
    bei = gen.boundary_connectivity2d(stride=2)
    battr = gen.attributes_boundary(theta=np.arange(25.0))
    assert battr.shape == (bei.shape[1], 6)


def test_prefetch_to_device():
    data = {"x": np.arange(24).reshape(12, 2)}
    got = list(prefetch_to_device(batch_iterator(data, 3), size=2))
    assert len(got) == 4
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b["x"]) for b in got]),
        data["x"])
