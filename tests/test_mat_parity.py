"""End-to-end .mat ingestion parity harness (docs/PARITY.md).

Writes tiny synthetic datasets to BOTH MATLAB formats, round-trips them
through MatReader, and runs experiment configs from the files via the
same ``data_path=`` path the reference datasets would use
(reference loaders: UAI1_full_resolution.py:85-97 for Darcy,
neurips5_GKN.py:42-48 for Burgers).
"""
import dataclasses
import json

import numpy as np
import pytest

from graph_pde_tpu.utils.matio import MatReader, write_mat
from graph_pde_tpu.data import load_or_generate_darcy
from graph_pde_tpu.data.synthetic import burgers_dataset
from graph_pde_tpu.experiments import get, run_experiment


@pytest.mark.parametrize("v73", [False, True])
def test_write_read_roundtrip(tmp_path, v73):
    rng = np.random.default_rng(0)
    fields = {
        "coeff": rng.normal(size=(3, 5, 5)).astype(np.float32),
        "sol": rng.normal(size=(3, 5, 5)).astype(np.float32),
        "a": rng.normal(size=(3, 7)).astype(np.float32),
    }
    path = str(tmp_path / f"rt_{v73}.mat")
    write_mat(path, fields, v73=v73)
    reader = MatReader(path)
    assert reader.old_mat is (not v73)
    for k, v in fields.items():
        np.testing.assert_array_equal(reader.read_field(k), v)


@pytest.fixture(scope="module")
def darcy_mat(tmp_path_factory):
    """Tiny Darcy dataset written to both formats."""
    d = tmp_path_factory.mktemp("darcy_mat")
    fields = load_or_generate_darcy(12, 17, seed=7)
    old = str(d / "darcy_old.mat")
    new = str(d / "darcy_v73.mat")
    write_mat(old, fields, v73=False)
    write_mat(new, fields, v73=True)
    return fields, old, new


def test_gkn_runs_from_mat_both_formats(darcy_mat):
    """The same experiment run from pre-v7.3 and v7.3 files gives
    identical results (they hold identical data), and matches the
    field values written."""
    fields, old, new = darcy_mat
    base = dataclasses.replace(
        get("neurips1_gkn").smoke(), source_res=17, ntrain=6, ntest=4,
        nystrom_m=24, graphs_per_sample=1)
    res_old = run_experiment(dataclasses.replace(
        base, data_path=old, test_data_path=old))
    res_new = run_experiment(dataclasses.replace(
        base, data_path=new, test_data_path=new))
    assert np.isfinite(res_old["train_l2"][-1])
    np.testing.assert_allclose(res_old["train_l2"], res_new["train_l2"],
                               rtol=1e-6)
    np.testing.assert_allclose(
        res_old["final_test_l2"], res_new["final_test_l2"], rtol=1e-6)


def test_mgkn_runs_from_mat(darcy_mat):
    fields, old, _ = darcy_mat
    cfg = dataclasses.replace(
        get("mgkn_general_darcy2d").smoke(), source_res=17,
        downsample=1, ntrain=6, ntest=4, data_path=old,
        test_data_path=old, eval_protocol=None)
    res = run_experiment(cfg)
    assert np.isfinite(res["train_l2"][-1])
    assert np.isfinite(res["final_test_l2"])


def test_burgers_runs_from_mat(tmp_path):
    fields = burgers_dataset(8, 64, seed=3)
    path = str(tmp_path / "burgers_v73.mat")
    write_mat(path, fields, v73=True)  # real burgers_data_R10.mat is v7.3
    cfg = dataclasses.replace(
        get("neurips5_gkn").smoke(), ntrain=4, ntest=2,
        data_path=path, test_data_path=path)
    res = run_experiment(cfg)
    assert np.isfinite(res["train_l2"][-1])


def test_cli_expect_l2_pass_and_fail(darcy_mat, tmp_path, capsys):
    """docs/PARITY.md workflow: --expect-l2 turns a run into an
    assertion with exit code 0/1."""
    from graph_pde_tpu.cli import main

    fields, old, _ = darcy_mat
    out = str(tmp_path / "res.json")
    argv = ["run", "neurips1_gkn", "--smoke",
            "--set", "source_res=17", "--set", "ntrain=6",
            "--set", "ntest=4", "--set", "nystrom_m=24",
            "--set", f"data_path={old}",
            "--set", f"test_data_path={old}",
            "--out", out]
    assert main(argv) == 0
    with open(out) as f:
        value = float(json.load(f)["final_test_l2"])
    capsys.readouterr()
    assert main(argv + ["--expect-l2", str(value), "--tol", "1e-3"]) == 0
    assert "PASS" in capsys.readouterr().out
    assert main(argv + ["--expect-l2", str(value + 1.0),
                        "--tol", "1e-3"]) == 1
    assert "FAIL" in capsys.readouterr().out
