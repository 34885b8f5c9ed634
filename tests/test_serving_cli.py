"""End-to-end serving workflow: train (smoke) -> export bundle ->
predict on new fields via the CLI — the deployment path the reference
lacks entirely (its only persistence is a final torch.save,
UAI1_full_resolution.py:317, with no load/serve tooling)."""
import json
import os

import numpy as np

from graph_pde_tpu.cli import main


def test_run_bundle_predict_roundtrip(tmp_path, capsys):
    bundle = str(tmp_path / "bundle")
    # gaussian u-normalizer (scalar stats) so the bundle serves ANY
    # resolution; uai2 smoke trains at s=33 in ~tens of seconds on CPU
    rc = main(["run", "uai2_full_equation", "--smoke", "--bundle", bundle])
    assert rc == 0
    assert os.path.exists(os.path.join(bundle, "bundle.json"))
    capsys.readouterr()

    # 1) synthetic fields at a DIFFERENT resolution (discretization
    # invariance: same weights, 17-grid graphs)
    out_mat = str(tmp_path / "pred.mat")
    rc = main(["predict", bundle, "--synthetic", "2", "--res", "17",
               "--output", out_mat])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n"] == 2 and summary["s"] == 17
    assert np.isfinite(summary["rel_l2"])  # synthetic path carries truth

    from graph_pde_tpu.utils.matio import MatReader

    pred = MatReader(out_mat).read_field("pred")
    assert pred.shape == (2, 17, 17)
    assert np.isfinite(pred).all()

    # 2) .mat input path (coeff only -> aux fields derived) + truth
    from graph_pde_tpu.data import load_or_generate_darcy
    from graph_pde_tpu.utils.matio import write_mat

    fields = load_or_generate_darcy(2, 17)
    in_mat = str(tmp_path / "fields.mat")
    write_mat(in_mat, {"coeff": fields["coeff"], "sol": fields["sol"]})
    rc = main(["predict", bundle, "--input", in_mat,
               "--truth-field", "sol"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["s"] == 17 and np.isfinite(summary["rel_l2"])


def test_mgkn_general_bundle_predict_roundtrip(tmp_path, capsys):
    """MGKN-general serving via the reference's split/assemble protocol
    (MGKN_general_darcy2d.py:306-333): train smoke -> bundle -> predict
    at the training resolution (unit u-norm pins per-node stats)."""
    bundle = str(tmp_path / "b2")
    rc = main(["run", "neurips2_mgkn", "--smoke", "--bundle", bundle])
    assert rc == 0
    capsys.readouterr()
    rc = main(["predict", bundle, "--synthetic", "1", "--res", "33"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n"] == 1 and summary["s"] == 33
    assert np.isfinite(summary["rel_l2"])


def test_mgkn_orthogonal_bundle_predict_roundtrip(tmp_path, capsys):
    """Orthogonal-MGKN serving at the bundle's training s (the dyadic
    level hierarchy is baked into the weights)."""
    bundle = str(tmp_path / "b3")
    rc = main(["run", "mgkn_orthogonal_burgers1d", "--smoke",
               "--bundle", bundle])
    assert rc == 0
    capsys.readouterr()
    out_mat = str(tmp_path / "pred1d.mat")
    rc = main(["predict", bundle, "--synthetic", "2",
               "--output", out_mat])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n"] == 2 and np.isfinite(summary["rel_l2"])

    from graph_pde_tpu.utils.matio import MatReader

    pred = MatReader(out_mat).read_field("pred")
    assert pred.shape == (2, summary["s"]) and np.isfinite(pred).all()


def test_predictor_guards_unit_norm_resolution_mismatch():
    """A unit (per-node) u-normalizer trained on one grid must refuse to
    decode another resolution (positional stats would silently
    mis-index) — gaussian u-norm bundles serve any resolution."""
    import jax
    import pytest

    from graph_pde_tpu.data import (load_or_generate_darcy, prepare_darcy)
    from graph_pde_tpu.inference import GKNPredictor
    from graph_pde_tpu.models import GKNConfig, gkn_init

    fields = load_or_generate_darcy(2, 17)
    arrays, norms = prepare_darcy(fields, n=2, u_norm="unit")
    cfg = GKNConfig(width=8, ker_width=16, depth=1, ker_in=6, in_width=6)
    pred = GKNPredictor(gkn_init(jax.random.PRNGKey(0), cfg), cfg,
                        input_normalizers=norms,
                        u_normalizer=arrays.u_normalizer, radius=0.3)
    out = pred.predict(fields["coeff"], fields["Kcoeff"],
                       fields["Kcoeff_x"], fields["Kcoeff_y"])
    assert out.shape == (2, 17 * 17)

    coarse = fields["coeff"][:, ::2, ::2]
    with pytest.raises(ValueError, match="training"):
        pred.predict(coarse)


def test_run_figures_profile_curves(tmp_path, capsys):
    """`cli run --figures/--profile/--curves` emit per-run artifacts:
    worst/median/best triptychs (reference visual-inspection parity,
    UAI1_full_resolution.py:335-461), a jax.profiler trace, and
    epoch-indexed error-curve files."""
    figs = str(tmp_path / "figs")
    prof = str(tmp_path / "prof")
    curves = str(tmp_path / "curves")
    rc = main(["run", "neurips1_gkn", "--smoke", "--figures", figs,
               "--profile", prof, "--curves", curves])
    assert rc == 0
    capsys.readouterr()
    pngs = sorted(os.listdir(figs))
    assert [p.split("_")[-1] for p in pngs] == \
        ["best.png", "median.png", "worst.png"]
    assert os.listdir(prof), "no profiler trace captured"
    train = np.loadtxt(os.path.join(curves, "neurips1_gkn_train_l2.txt"))
    test = np.loadtxt(os.path.join(curves, "neurips1_gkn_test_l2.txt"))
    assert train.shape[1] == 2 and test.shape[1] == 2
    assert train[0, 0] == 1.0  # epoch column


def test_sweep_cli_smoke_respects_axis(tmp_path, capsys):
    """`cli sweep --smoke` must re-apply the swept axis after the smoke
    shrink (which would otherwise clobber it and run identical points)."""
    import json as _json

    out = str(tmp_path / "sweep.json")
    rc = main(["sweep", "uai8_kernel", "--smoke",
               "--axis", "ker_width=[32,64]", "--out", out])
    assert rc == 0
    with open(out) as f:
        res = _json.load(f)
    assert [r["swept"]["ker_width"] for r in res] == [32, 64]
    # different kernel widths -> different trained models
    assert res[0]["final_test_l2"] != res[1]["final_test_l2"]
