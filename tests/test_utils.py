"""Unit tests for the utils layer, checked against torch/scipy reference math."""
import numpy as np
import pytest

from graph_pde_tpu.utils import (
    UnitGaussianNormalizer,
    GaussianNormalizer,
    RangeNormalizer,
    LpLoss,
    MatReader,
    gaussian_filter,
)


def test_unit_gaussian_normalizer_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(16, 50)).astype(np.float32)
    norm = UnitGaussianNormalizer(x)
    enc = norm.encode(x)
    # per-location stats (ddof=1, matching torch.std)
    np.testing.assert_allclose(np.asarray(norm.std),
                               np.std(x, axis=0, ddof=1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(norm.decode(enc)), x,
                               rtol=1e-4, atol=1e-4)


def test_unit_gaussian_decode_sample_idx():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 30)).astype(np.float32)
    norm = UnitGaussianNormalizer(x)
    idx = np.stack([rng.permutation(30)[:10] for _ in range(4)])  # [4, 10]
    enc_full = np.asarray(norm.encode(x[:4]))
    enc_sub = np.take_along_axis(enc_full, idx, axis=1)
    dec = np.asarray(norm.decode(enc_sub, sample_idx=idx))
    expected = np.take_along_axis(x[:4], idx, axis=1)
    np.testing.assert_allclose(dec, expected, rtol=1e-4, atol=1e-4)


def test_unit_gaussian_decode_sample_idx_time_axis():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(8, 3, 30)).astype(np.float32)  # ntrain x T x n
    norm = UnitGaussianNormalizer(x)
    assert norm.mean.shape == (3, 30)
    idx = np.stack([rng.permutation(30)[:10] for _ in range(4)])  # [batch=4, 10]
    enc = np.asarray(norm.encode(x))  # [8, 3, 30]
    sub = enc[:4].transpose(1, 0, 2)  # T x batch x n
    sub = np.stack([np.take_along_axis(sub[t], idx, axis=1) for t in range(3)])
    dec = np.asarray(norm.decode(sub, sample_idx=idx))
    expected = x[:4].transpose(1, 0, 2)
    expected = np.stack(
        [np.take_along_axis(expected[t], idx, axis=1) for t in range(3)])
    np.testing.assert_allclose(dec, expected, rtol=1e-4, atol=1e-4)


def test_gaussian_normalizer_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(5.0, 2.0, size=(12, 40)).astype(np.float32)
    norm = GaussianNormalizer(x)
    tx = torch.from_numpy(x)
    np.testing.assert_allclose(float(norm.mean), float(tx.mean()), rtol=1e-5)
    np.testing.assert_allclose(float(norm.std), float(tx.std()), rtol=1e-5)
    enc = np.asarray(norm.encode(x))
    np.testing.assert_allclose(np.asarray(norm.decode(enc)), x,
                               rtol=1e-4, atol=1e-4)


def test_range_normalizer():
    rng = np.random.default_rng(3)
    x = rng.uniform(-5, 7, size=(10, 6)).astype(np.float32)
    norm = RangeNormalizer(x, low=0.0, high=1.0)
    enc = np.asarray(norm.encode(x))
    assert enc.min() >= -1e-5 and enc.max() <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(norm.decode(enc)), x,
                               rtol=1e-4, atol=1e-4)


def test_lploss_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, 33)).astype(np.float32)
    y = rng.normal(size=(5, 33)).astype(np.float32)

    loss = LpLoss(size_average=False)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)

    # reference rel (utilities.py:187-199)
    diff = torch.norm(tx - ty, 2, 1)
    yn = torch.norm(ty, 2, 1)
    ref_rel = torch.sum(diff / yn).item()
    np.testing.assert_allclose(float(loss.rel(x, y)), ref_rel, rtol=1e-5)

    # reference abs (utilities.py:171-185)
    h = 1.0 / (33 - 1.0)
    ref_abs = torch.sum(h * torch.norm(tx - ty, 2, 1)).item()
    np.testing.assert_allclose(float(loss.abs(x, y)), ref_abs, rtol=1e-5)

    loss_avg = LpLoss()
    np.testing.assert_allclose(float(loss_avg(x, y)), ref_rel / 5, rtol=1e-5)


def test_lploss_masked_equals_unmasked_on_full_mask():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, 20)).astype(np.float32)
    y = rng.normal(size=(3, 20)).astype(np.float32)
    loss = LpLoss(size_average=False)
    full = float(loss.rel(x, y))
    masked = float(loss.rel_masked(x, y, np.ones_like(x)))
    np.testing.assert_allclose(masked, full, rtol=1e-6)
    # padded version: extend with garbage, mask it out
    xp = np.concatenate([x, rng.normal(size=(3, 7)).astype(np.float32)], 1)
    yp = np.concatenate([y, rng.normal(size=(3, 7)).astype(np.float32)], 1)
    m = np.concatenate([np.ones((3, 20)), np.zeros((3, 7))], 1)
    np.testing.assert_allclose(float(loss.rel_masked(xp, yp, m)), full,
                               rtol=1e-5)


def test_matreader_old_and_v73(tmp_path):
    import scipy.io

    rng = np.random.default_rng(7)
    field = rng.normal(size=(4, 5, 6)).astype(np.float64)
    p_old = str(tmp_path / "old.mat")
    scipy.io.savemat(p_old, {"sol": field})
    r = MatReader(p_old)
    out = r.read_field("sol")
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, field.astype(np.float32), rtol=1e-6)

    # v7.3 files are HDF5 with reversed axis order
    h5py = pytest.importorskip("h5py")
    p_new = str(tmp_path / "new.mat")
    with h5py.File(p_new, "w") as f:
        f.create_dataset("sol", data=field.T)  # stored column-major
    r.load_file(p_new)
    out2 = r.read_field("sol")
    np.testing.assert_allclose(out2, field.astype(np.float32), rtol=1e-6)


def test_gaussian_filter_matches_scipy():
    from scipy.ndimage import gaussian_filter as scipy_gf

    rng = np.random.default_rng(8)
    x = rng.normal(size=(17, 17)).astype(np.float32)
    for mode in ("constant", "wrap"):
        ours = np.asarray(gaussian_filter(x, sigma=1.0, mode=mode))
        ref = scipy_gf(x, sigma=1.0, mode=mode, cval=0.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # 3-d (assembleT path) + non-integer sigma
    x3 = rng.normal(size=(3, 9, 9)).astype(np.float32)
    ours = np.asarray(gaussian_filter(x3, sigma=1.5, mode="wrap"))
    ref = scipy_gf(x3, sigma=1.5, mode="wrap")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
