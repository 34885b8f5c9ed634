"""Export the shared synthetic .mat datasets for the oracle A/B.

Writes the reference's dataset layout (Darcy: coeff/Kcoeff/Kcoeff_x/
Kcoeff_y/sol on an s*s grid, piececonst_*.mat fields per
UAI3_resolution.py:78-91; Burgers: a/u per
MGKN_orthogonal_burgers1d.py:136-142) from graph_pde_tpu's synthetic
generators via utils.matio.write_mat, so the torch oracle and the JAX
framework train on byte-identical inputs.

Usage:
    python -m oracle.export_data --out results/oracle_data
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/oracle_data")
    ap.add_argument("--darcy-res", type=int, default=241)
    ap.add_argument("--darcy-train", type=int, default=100)
    ap.add_argument("--darcy-test", type=int, default=20)
    ap.add_argument("--burgers-res", type=int, default=2048)
    ap.add_argument("--burgers-n", type=int, default=80,
                    help="one file; train takes the first n-ntest, test "
                         "the last ntest (reference reads one file for "
                         "both, MGKN_orthogonal_burgers1d.py:136-142)")
    args = ap.parse_args()

    from graph_pde_tpu.data import (load_or_generate_darcy,
                                    load_or_generate_burgers)
    from graph_pde_tpu.utils.matio import write_mat

    os.makedirs(args.out, exist_ok=True)

    # Darcy: separate train/test files like piececonst_r241 smooth1/2
    train = load_or_generate_darcy(args.darcy_train, args.darcy_res,
                                   seed=101)
    write_mat(os.path.join(args.out, "darcy_train.mat"), dict(train))
    test = load_or_generate_darcy(args.darcy_test, args.darcy_res,
                                  seed=202)
    write_mat(os.path.join(args.out, "darcy_test.mat"), dict(test))

    burgers = load_or_generate_burgers(args.burgers_n, args.burgers_res,
                                       seed=303)
    write_mat(os.path.join(args.out, "burgers.mat"), dict(burgers))
    print(f"wrote darcy_train/darcy_test/burgers under {args.out}")


if __name__ == "__main__":
    main()
