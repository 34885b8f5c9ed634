"""Smoke tests: every registered experiment family runs end to end."""
import numpy as np
import pytest

from graph_pde_tpu.experiments import get, names, run_experiment


def test_registry_covers_reference_scripts():
    expected = {
        "uai1_full_resolution", "uai2_full_equation", "uai3_resolution",
        "uai4_equation_sample", "uai5_sample_generalize",
        "uai6_sample_radius", "uai7_evaluate", "uai7_evaluate2",
        "uai8_kernel", "neurips1_gkn", "neurips1_mgkn", "neurips2_mgkn",
        "neurips3_mgkn", "neurips4_gcn", "neurips5_gkn",
        "mgkn_general_darcy2d", "mgkn_orthogonal_burgers1d",
    }
    assert expected <= set(names())


@pytest.mark.parametrize("name", [
    "neurips1_gkn",              # GKN darcy nystrom
    "uai3_resolution",           # GKN + multires eval
    "uai7_evaluate",             # split_downsample full-field eval
    "uai7_evaluate2",            # split_random full-field eval
    "neurips1_mgkn",             # induced-variant MGKN
    "neurips3_mgkn",             # MGKN multires eval
    "mgkn_general_darcy2d",      # flagship MGKN + split/assemble eval
    "mgkn_orthogonal_burgers1d", # flagship orthogonal MGKN
    "neurips5_gkn",              # burgers GKN + 1-d split eval
    "neurips4_gcn",              # GCN baseline
    "uai1_full_resolution",      # full-grid GKN, L1 backward, multires
    "uai2_full_equation",        # full-grid GKN long run
    "uai4_equation_sample",      # sample-count protocol at full res
    "uai5_sample_generalize",    # train-m vs test-m generalization
    "uai6_sample_radius",        # m x radius protocol
    "uai8_kernel",               # 5-layer kernel MLP (nn5)
    "neurips2_mgkn",             # single-level MGKN ablation
    "uai4_full_grid_241",        # full-grid blocked-CSR regime
    "grain_torus_timeseries",    # T-step periodic sampleT/assembleT
])
def test_experiment_smoke(name):
    result = run_experiment(get(name), smoke=True)
    assert np.isfinite(result["train_l2"][-1])
    if result.get("final_test_l2") is not None:
        assert np.isfinite(result["final_test_l2"])
    if "multires" in result:
        for s, v in result["multires"].items():
            assert np.isfinite(v), (s, v)
    if "full_field_l2" in result:
        assert np.isfinite(result["full_field_l2"])


def test_cli_list_and_smoke_run(capsys):
    from graph_pde_tpu.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "neurips1_gkn" in out


def test_sweep_configs():
    from graph_pde_tpu.experiments import sweep_configs

    cfgs = sweep_configs("uai6_sample_radius")
    assert len(cfgs) == 9  # 3 m x 3 radius
    assert {c.radius_train for c in cfgs} == {0.05, 0.15, 0.4}
    # tiny smoke of one swept point
    from graph_pde_tpu.experiments import run_experiment
    import numpy as np
    res = run_experiment(cfgs[0], smoke=True)
    assert np.isfinite(res["train_l2"][-1])
