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
