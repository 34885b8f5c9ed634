"""Trainer extras: scanned epoch parity, checkpoint resume, metrics."""
import numpy as np
import jax
import pytest

from graph_pde_tpu.data import darcy_dataset, prepare_darcy, darcy_gkn_graphs
from graph_pde_tpu.models import GKNConfig, gkn_init
from graph_pde_tpu.train import GKNTask, TrainConfig, fit
from graph_pde_tpu.train.trainer import make_epoch_fn, stack_epoch, \
    make_train_step
from graph_pde_tpu.train.optim import adam_steplr
from graph_pde_tpu.train.metrics import MetricsLogger, save_field_triptych


@pytest.fixture(scope="module")
def setup():
    fields = darcy_dataset(8, 16, seed=0)
    arrays, _ = prepare_darcy(fields, n=8)
    graphs = darcy_gkn_graphs(arrays, radius=0.25, seed=0)
    cfg = GKNConfig(width=8, ker_width=16, depth=2, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=True)
    return graphs, cfg, params, task


def test_scanned_epoch_matches_stepwise(setup):
    graphs, cfg, params, task = setup
    tx = adam_steplr(1e-3, weight_decay=0.0, steps_per_epoch=1)
    step = make_train_step(task, tx)
    epoch_fn = make_epoch_fn(task, tx)

    def copy(p):
        return jax.tree_util.tree_map(lambda a: a + 0, p)

    batches = stack_epoch(graphs, 2)  # no shuffle -> same order
    # stepwise (the jitted step donates its inputs; use private copies)
    p1, o1 = copy(params), tx.init(params)
    for i in range(batches.x.shape[0]):
        b = jax.tree_util.tree_map(lambda a: a[i], batches)
        p1, o1, _ = step(p1, o1, b)
    # scanned
    p2, o2, loss, l2 = epoch_fn(copy(params), tx.init(params), batches)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fit_checkpoint_resume(tmp_path, setup):
    graphs, cfg, params, task = setup
    tc = TrainConfig(epochs=4, batch_size=2, learning_rate=1e-3,
                     weight_decay=0.0, loss="l1")
    d = str(tmp_path / "ckpt")
    # full run
    res_full = fit(task, params, graphs, tc)
    # run 2 epochs, checkpoint, resume for the rest
    tc2 = TrainConfig(epochs=2, batch_size=2, learning_rate=1e-3,
                      weight_decay=0.0, loss="l1")
    fit(task, params, graphs, tc2, checkpoint_dir=d)
    res_resumed = fit(task, params, graphs, tc, checkpoint_dir=d,
                      resume=True)
    # resumed run trained only epochs 2..4
    assert len(res_resumed.train_l2) == 2
    assert np.isfinite(res_resumed.train_l2[-1])


def test_metrics_logger(tmp_path):
    log = MetricsLogger(out_dir=str(tmp_path), name="t", echo=False)
    for ep in range(3):
        log.log(ep, train_l2=1.0 / (ep + 1), test_l2=2.0 / (ep + 1))
    arr = log.save_txt("train_l2")
    assert arr.shape == (3,)
    np.testing.assert_allclose(arr, [1.0, 0.5, 1.0 / 3])
    log.close()
    assert (tmp_path / "t.jsonl").exists()
    assert (tmp_path / "t_train_l2.txt").exists()


def test_triptych(tmp_path):
    truth = np.random.default_rng(0).normal(size=(64,))
    approx = truth + 0.1
    p = save_field_triptych(truth, approx, str(tmp_path / "img" / "t.png"))
    if p is not None:
        import os
        assert os.path.exists(p)


def test_model_bundle_roundtrip(tmp_path, setup):
    from graph_pde_tpu.train import save_bundle, load_bundle
    from graph_pde_tpu.utils import GaussianNormalizer

    graphs, cfg, params, task = setup
    norm = GaussianNormalizer(np.random.default_rng(0).normal(size=(4, 10)))
    d = save_bundle(str(tmp_path / "bundle"), params, cfg,
                    normalizers={"u": norm}, extra={"radius": 0.25})
    p2, cfg2, norms, extra = load_bundle(d)
    assert cfg2 == cfg
    assert extra["radius"] == 0.25
    np.testing.assert_allclose(float(norms["u"].mean), float(norm.mean),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # loaded bundle drives the model
    from graph_pde_tpu.models import gkn_apply
    g0 = jax.tree_util.tree_map(lambda a: a[0], graphs)
    out = gkn_apply(p2, cfg2, g0)
    assert np.isfinite(np.asarray(out)).all()
