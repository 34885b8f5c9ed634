"""Inference API: trained GKN predicts at multiple resolutions."""
import numpy as np
import jax
import pytest

from graph_pde_tpu.data import darcy_dataset, prepare_darcy, darcy_gkn_graphs
from graph_pde_tpu.models import GKNConfig, gkn_init
from graph_pde_tpu.train import GKNTask, TrainConfig, fit
from graph_pde_tpu.inference import GKNPredictor
from graph_pde_tpu.utils import LpLoss


def test_predictor_multiresolution_and_split():
    fields = darcy_dataset(14, 17, seed=0)
    arrays, norms = prepare_darcy(fields, n=12, u_norm="gaussian")
    graphs = darcy_gkn_graphs(arrays, radius=0.3, seed=0)

    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=6, in_width=6,
                    impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer, loss_type="l1",
                   use_sample_idx=False)
    res = fit(task, params, graphs,
              TrainConfig(epochs=10, batch_size=4, learning_rate=2e-3,
                          scheduler_step=5, scheduler_gamma=0.8, loss="l1"))

    pred = GKNPredictor(params=res.params, cfg=cfg,
                        input_normalizers=norms,
                        u_normalizer=arrays.u_normalizer, radius=0.3)

    # same-resolution prediction on held-out samples
    out = pred.predict(fields["coeff"][12:], fields["Kcoeff"][12:],
                       fields["Kcoeff_x"][12:], fields["Kcoeff_y"][12:])
    assert out.shape == (2, 17 * 17)
    lp = LpLoss()
    err = float(lp.rel(out, fields["sol"][12:].reshape(2, -1)))
    assert np.isfinite(err) and err < 1.0

    # auxiliary fields derived automatically
    out2 = pred.predict(fields["coeff"][12:])
    assert np.isfinite(out2).all()

    # forced split/assemble path
    pred.split_threshold = 10
    pred.split_m = 17
    out3 = pred.predict(fields["coeff"][12:13], fields["Kcoeff"][12:13],
                        fields["Kcoeff_x"][12:13], fields["Kcoeff_y"][12:13])
    assert out3.shape == (1, 289)
    assert np.isfinite(out3).all()
