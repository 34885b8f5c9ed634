"""Native C++ cell-list radius builder: parity and performance sanity."""
import numpy as np
import pytest

from graph_pde_tpu.graph import native, radius_connectivity


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native builder unavailable (no toolchain)")
    return True


def _as_set(src, dst):
    return set(zip(src.tolist(), dst.tolist()))


def test_native_matches_dense(lib_ok):
    rng = np.random.default_rng(0)
    for d in (1, 2, 3):
        pts = rng.uniform(size=(200, d))
        for r in (0.05, 0.2, 0.5):
            src, dst = native.native_radius(pts, None, r)
            dense = radius_connectivity(pts, r, method="dense")
            assert _as_set(src, dst) == _as_set(dense[0], dense[1]), (d, r)


def test_native_bipartite(lib_ok):
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(80, 2))
    b = rng.uniform(size=(50, 2))
    src, dst = native.native_radius(a, b, 0.3)
    dd = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    ref = np.stack(np.where(dd <= 0.3))
    assert _as_set(src, dst) == _as_set(ref[0], ref[1])


def test_native_includes_self_loops(lib_ok):
    pts = np.random.default_rng(2).uniform(size=(50, 2))
    src, dst = native.native_radius(pts, None, 0.1)
    s = _as_set(src, dst)
    for i in range(50):
        assert (i, i) in s


def test_radius_connectivity_uses_native_when_available(lib_ok):
    # the default 'tree' method tries native first; verify it agrees with
    # dense on a boundary-heavy case
    pts = np.random.default_rng(3).uniform(size=(300, 2))
    tree = radius_connectivity(pts, 0.17)
    dense = radius_connectivity(pts, 0.17, method="dense")
    assert _as_set(tree[0], tree[1]) == _as_set(dense[0], dense[1])


def test_native_speed_on_large_grid(lib_ok):
    """The reference's CPU hot spot: radius graph on a fine grid. The cell
    list must handle s=121 (14641 nodes) in well under a second."""
    import time
    from graph_pde_tpu.graph import make_box_grid

    pts = make_box_grid([[0, 1], [0, 1]], [121, 121])
    t0 = time.perf_counter()
    src, dst = native.native_radius(pts, None, 0.02)
    dt = time.perf_counter() - t0
    assert src.size > 14641  # at least the self loops + neighbors
    assert dt < 2.0, f"native build too slow: {dt:.2f}s"


def _dense_torus2d(points, r):
    """Dense 9-shift reference (the pre-native torus2d_connectivity)."""
    grid = np.asarray(points, np.float64).reshape(-1, 2)
    shifts = np.array([[sx, sy] for sx in (0.0, 1.0, -1.0)
                       for sy in (0.0, 1.0, -1.0)])
    x_diffs, y_diffs, dists = [], [], []
    for s in shifts:
        shifted = grid + s[None, :]
        dx = grid[:, None, 0] - shifted[None, :, 0]
        dy = grid[:, None, 1] - shifted[None, :, 1]
        x_diffs.append(dx)
        y_diffs.append(dy)
        dists.append(np.sqrt(dx * dx + dy * dy))
    pwd = np.stack(dists, axis=2)
    xd = np.stack(x_diffs, axis=2)
    yd = np.stack(y_diffs, axis=2)
    dmin = pwd.min(axis=2)
    amin = pwd.argmin(axis=2)
    src, dst = np.where(dmin <= r)
    sel = (src, dst, amin[src, dst])
    return (np.stack([src.astype(np.int64), dst.astype(np.int64)]),
            pwd[sel], xd[sel], yd[sel])


@pytest.mark.parametrize("case", ["random", "even_grid_ties", "big_r"])
def test_native_torus2d_bit_parity(lib_ok, case):
    """The native periodic builder must be BIT-identical to the dense
    9-shift numpy path — including argmin tie-breaking on even grids
    where opposite shifted copies are exactly equidistant (|dx|=0.5)."""
    rng = np.random.default_rng(3)
    if case == "random":
        pts, r = rng.random((300, 2)), 0.2
    elif case == "even_grid_ties":
        g = np.arange(16) / 16.0
        pts = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
        r = 0.55  # reaches the 0.5-tie pairs
    else:
        pts, r = rng.random((150, 2)), 0.8
    ei_n, d_n, dx_n, dy_n = native.native_torus2d(pts, r)
    ei_d, d_d, dx_d, dy_d = _dense_torus2d(pts, r)
    np.testing.assert_array_equal(ei_n, ei_d)
    np.testing.assert_array_equal(d_n, d_d)
    np.testing.assert_array_equal(dx_n, dx_d)
    np.testing.assert_array_equal(dy_n, dy_d)


def test_torus2d_connectivity_uses_native(lib_ok):
    from graph_pde_tpu.graph.build import torus2d_connectivity

    rng = np.random.default_rng(4)
    pts = rng.random((100, 2))
    ei, d, dx, dy = torus2d_connectivity(pts, 0.3)
    ei_d, d_d, dx_d, dy_d = _dense_torus2d(pts, 0.3)
    np.testing.assert_array_equal(np.asarray(ei), ei_d)
    np.testing.assert_array_equal(d, d_d)
