"""End-to-end: data -> graphs -> model -> training converges.

The reference has no tests; its correctness oracle is printed convergence
plus resolution generalization (SURVEY.md section 4). These tests encode
that oracle at miniature scale.
"""
import numpy as np
import jax
import pytest

from graph_pde_tpu.data import (
    darcy_dataset, prepare_darcy, darcy_gkn_graphs, darcy_mgkn_graphs,
    burgers_dataset, prepare_burgers, burgers_gkn_graphs,
    batch_iterator,
)
from graph_pde_tpu.models import (
    GKNConfig, gkn_init, MGKNGeneralConfig, mgkn_general_init,
)
from graph_pde_tpu.train import (
    TrainConfig, GKNTask, MGKNGeneralTask, fit, evaluate,
    save_checkpoint, restore_checkpoint,
)


@pytest.fixture(scope="module")
def darcy_fields():
    return darcy_dataset(24, 16, seed=0)


def test_darcy_gkn_dataset_shapes(darcy_fields):
    arrays, norms = prepare_darcy(darcy_fields, n=16)
    graphs = darcy_gkn_graphs(arrays, radius=0.25, seed=0)
    assert graphs.x.shape[0] == 16
    assert graphs.x.shape[2] == 6
    assert graphs.edge_attr.shape[2] == 6
    # batching iterator
    batches = list(batch_iterator(graphs, 4))
    assert len(batches) == 4
    assert batches[0].x.shape[0] == 4


def test_gkn_darcy_converges(darcy_fields):
    """Train tiny GKN on s=16 Darcy; train rel-L2 must drop well below the
    trivial predictor's and test error must follow."""
    arrays, norms = prepare_darcy(darcy_fields, n=16, u_norm="unit")
    test_arrays, _ = prepare_darcy(
        {k: v[16:] for k, v in darcy_fields.items()}, n=8,
        normalizers=norms, u_normalizer=arrays.u_normalizer)
    # test u stays un-encoded in the reference; encode for the trainer's
    # shared loss, decode handles metrics
    test_arrays.u = np.asarray(arrays.u_normalizer.encode(test_arrays.u))

    train_g = darcy_gkn_graphs(arrays, radius=0.25, seed=0)
    test_g = darcy_gkn_graphs(test_arrays, radius=0.25, seed=1)

    cfg = GKNConfig(width=24, ker_width=48, depth=3, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=False)
    tc = TrainConfig(epochs=25, batch_size=4, learning_rate=2e-3,
                     weight_decay=5e-4, scheduler_step=10,
                     scheduler_gamma=0.7, loss="l1")
    res = fit(task, params, train_g, tc, test_data=test_g)
    assert res.train_l2[-1] < 0.5 * res.train_l2[0], res.train_l2
    assert res.train_l2[-1] < 0.25
    assert res.test_l2[-1] < 0.6 * res.test_l2[0], res.test_l2


def test_gkn_nystrom_with_sample_idx_decode(darcy_fields):
    arrays, _ = prepare_darcy(darcy_fields, n=8, u_norm="unit")
    graphs = darcy_gkn_graphs(arrays, m=60, k=2, radius=0.35, seed=0)
    assert graphs.x.shape[0] == 16  # k=2 graphs per sample
    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(1), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="mse")
    err = evaluate(task, params, graphs, batch_size=4)
    assert np.isfinite(err)


def test_mgkn_general_trains(darcy_fields):
    arrays, _ = prepare_darcy(darcy_fields, n=8, u_norm="unit")
    graphs, caps = darcy_mgkn_graphs(
        arrays, points=(60, 30, 15), radius_inner=(0.3, 0.6, 1.2),
        radius_inter=(0.15, 0.3), seed=0)
    cfg = MGKNGeneralConfig(width=16, ker_width=32, depth=2, ker_in=6,
                            in_width=6, points=(60, 30, 15),
                            impl="reference")
    params = mgkn_general_init(jax.random.PRNGKey(2), cfg)
    task = MGKNGeneralTask(cfg, u_normalizer=arrays.u_normalizer,
                           loss_type="rel2")
    tc = TrainConfig(epochs=8, batch_size=4, learning_rate=3e-3,
                     weight_decay=0.0, scheduler_step=5,
                     scheduler_gamma=0.8, loss="rel2")
    res = fit(task, params, graphs, tc)
    assert res.train_l2[-1] < res.train_l2[0]
    assert np.isfinite(res.train_l2[-1])


def test_burgers_gkn_dataset():
    fields = burgers_dataset(6, 128, seed=0, gen_res=1024)
    arrays = prepare_burgers(fields, n=6)
    graphs = burgers_gkn_graphs(arrays, m=48, radius=0.2, seed=0)
    assert graphs.x.shape == (6, 48, 2)
    assert graphs.edge_attr.shape[2] == 4
    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=4, in_width=2,
                    kernel_layers=GKNConfig.kernel_nn3_layers(4, 32, 16),
                    relu_last=False, decoder_mlp=True, impl="reference")
    params = gkn_init(jax.random.PRNGKey(3), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="mse")
    err = evaluate(task, params, graphs)
    assert np.isfinite(err)


def test_checkpoint_roundtrip(tmp_path, darcy_fields):
    arrays, _ = prepare_darcy(darcy_fields, n=4, u_norm="unit")
    cfg = GKNConfig(width=8, ker_width=16, depth=1, ker_in=6, in_width=6)
    params = gkn_init(jax.random.PRNGKey(4), cfg)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 10, params)
    save_checkpoint(d, 20, params)
    restored = restore_checkpoint(d)
    assert restored["step"] == 20
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fit_multi_epoch_size_guard(darcy_fields, monkeypatch):
    """Above MULTI_EPOCH_MAX_BYTES fit() must fall back to one epoch
    per jit (the round-4 uai1 full-grid TPU worker crash): per-epoch
    histories and per-epoch test evals, not chunk-boundary ones."""
    from graph_pde_tpu.train import trainer as trainer_mod

    arrays, _ = prepare_darcy(darcy_fields, n=12, u_norm="unit")
    train_g = darcy_gkn_graphs(arrays, radius=0.25, seed=0)
    cfg = GKNConfig(width=16, ker_width=32, depth=1, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=False)
    tc = TrainConfig(epochs=4, batch_size=4, learning_rate=2e-3,
                     loss="l1", epochs_per_jit=4)
    monkeypatch.setattr(trainer_mod, "MULTI_EPOCH_MAX_BYTES", 1024)
    with pytest.warns(UserWarning, match="falling\\s+back"):
        res = fit(task, params, train_g, tc, test_data=train_g)
    # fell back to the per-epoch path: test eval EVERY epoch
    assert res.test_epochs == [1, 2, 3, 4]
    assert len(res.train_l2) == 4


def test_fit_gather_epoch_path_matches_stack(darcy_fields, monkeypatch):
    """Above GATHER_EPOCH_MIN_BYTES fit() switches to the per-step
    batch gather (no full shuffled device copy — the neurips4_gcn OOM
    fix). Same seed => identical batch order, so histories must match
    the stack_epoch path to float tolerance."""
    from graph_pde_tpu.train import trainer as trainer_mod

    arrays, _ = prepare_darcy(darcy_fields, n=12, u_norm="unit")
    train_g = darcy_gkn_graphs(arrays, radius=0.25, seed=0)
    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=False)
    tc = TrainConfig(epochs=3, batch_size=4, learning_rate=2e-3,
                     loss="l1")
    r_stack = fit(task, params, train_g, tc, test_data=train_g)
    monkeypatch.setattr(trainer_mod, "GATHER_EPOCH_MIN_BYTES", 1024)
    r_gather = fit(task, params, train_g, tc, test_data=train_g)
    np.testing.assert_allclose(r_gather.train_l2, r_stack.train_l2,
                               rtol=1e-5)
    np.testing.assert_allclose(r_gather.test_l2, r_stack.test_l2,
                               rtol=1e-5)
    # chunked dispatch (worker-crash guard) must not change the math:
    # force one scan step per dispatch
    monkeypatch.setattr(trainer_mod, "GATHER_CHUNK_STEPS", 1)
    r_chunk = fit(task, params, train_g, tc, test_data=train_g)
    np.testing.assert_allclose(r_chunk.train_l2, r_stack.train_l2,
                               rtol=1e-5)


def test_fit_multi_epoch_chunks(darcy_fields):
    """epochs_per_jit>1 (K epochs scanned in one jit, on-device shuffle)
    must train equivalently to the per-epoch path: same history lengths,
    comparable convergence, and checkpointing still lands."""
    arrays, norms = prepare_darcy(darcy_fields, n=12, u_norm="unit")
    train_g = darcy_gkn_graphs(arrays, radius=0.25, seed=0)

    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=False)
    tc1 = TrainConfig(epochs=10, batch_size=4, learning_rate=2e-3,
                      loss="l1", epochs_per_jit=1)
    tc4 = TrainConfig(epochs=10, batch_size=4, learning_rate=2e-3,
                      loss="l1", epochs_per_jit=4)  # chunks 4+4+2
    r1 = fit(task, params, train_g, tc1, test_data=train_g)
    r4 = fit(task, params, train_g, tc4, test_data=train_g)
    assert len(r4.train_l2) == 10 and len(r4.epoch_times) == 10
    # test eval at chunk boundaries only: ceil(10/4) = 3 entries —
    # test_epochs carries the boundary indices so consumers can align
    # the two histories (zipping blindly would mis-pair silently)
    assert len(r4.test_l2) == 3
    assert r4.test_epochs == [4, 8, 10]
    assert r1.test_epochs == list(range(1, 11))
    # aligned curves for savetxt export carry epoch columns
    train_curve, test_curve = r4.curves()
    assert train_curve.shape == (10, 2) and test_curve.shape == (3, 2)
    np.testing.assert_array_equal(test_curve[:, 0], [4, 8, 10])
    # same optimization problem, different shuffle RNG: end-of-training
    # error must agree to ~20% relative
    assert abs(r4.train_l2[-1] - r1.train_l2[-1]) < 0.2 * r1.train_l2[-1]
    assert r4.train_l2[-1] < 0.5 * r4.train_l2[0]
