"""Torch oracle: the MGKN_orthogonal_burgers1d.py protocol at a
configurable scale.

Reproduces multipole .../MGKN_orthogonal_burgers1d.py:94-283 semantics:
stride-downsampled Burgers a/u; ScalarGaussian a-normalizer, Pointwise
(UnitGaussian) u-normalizer; multi_pole_grid1d periodic FMM hierarchy;
MGKN with avg_pool/nearest-upsample inter-level transfers and per-level
mean-aggr NNConv; Adam(lr, weight_decay=5e-4) + StepLR(10, 0.8);
DECODED rel-L2 backward (l2_loss.backward(), :236-240); final test
rel-L2 on decoded outputs. Train takes the first ntrain samples, test
the LAST ntest of the same file (:137-142).

Scale knobs default to the single-core A/B protocol (docs/ORACLE.md);
the JAX side runs the identical config via
`cli run mgkn_orthogonal_burgers1d --set ...`.

Usage:
    nice -n 19 python -m oracle.run_mgkn_orthogonal \
        --data results/oracle_data --seed 0 \
        --out results/oracle_mgkn_torch_s0.json
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn.functional as F

from .torch_ref import (MGKNOrthogonal1D, PointwiseGaussianNormalizer,
                        RelLpLoss, ScalarGaussianNormalizer, edge_attr_1d,
                        fmm_grid_1d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="results/oracle_data")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    # the scaled A/B protocol (identical on the JAX side)
    ap.add_argument("--r", type=int, default=8)          # 2048 -> s=256
    ap.add_argument("--ntrain", type=int, default=64)
    ap.add_argument("--ntest", type=int, default=16)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--ker-width", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--scheduler-step", type=int, default=10)
    ap.add_argument("--scheduler-gamma", type=float, default=0.8)
    args = ap.parse_args()

    torch.manual_seed(args.seed)

    from scipy.io import loadmat

    raw = loadmat(f"{args.data}/burgers.mat")
    a = torch.tensor(raw["a"], dtype=torch.float32)[:, :: args.r]
    u = torch.tensor(raw["u"], dtype=torch.float32)[:, :: args.r]
    s = a.shape[1]
    train_a, train_u = a[: args.ntrain], u[: args.ntrain]
    test_a, test_u = a[-args.ntest:], u[-args.ntest:]

    a_norm = ScalarGaussianNormalizer(train_a)
    train_a = a_norm.encode(train_a)
    test_a = a_norm.encode(test_a)
    u_norm = PointwiseGaussianNormalizer(train_u)
    train_u_enc = u_norm.encode(train_u)

    grids, edge_np = fmm_grid_1d(s, periodic=True)
    edge_lists = [torch.tensor(e, dtype=torch.long) for e in edge_np]

    def sample_data(theta_enc, y):
        """Per-sample (x_nodes, attr_lists, y): node features
        [grid, theta] at the finest level; per-edge-list attrs from the
        level the list lives on (i==0 -> level 0, else i-1;
        MGKN_orthogonal_burgers1d.py:171-183)."""
        out = []
        for j in range(theta_enc.shape[0]):
            th_levels = [theta_enc[j].numpy()[:: 2 ** lev]
                         for lev in range(len(grids))]
            x = np.stack([grids[0], th_levels[0]], axis=1)
            attrs = []
            for i, ei in enumerate(edge_np):
                lev = 0 if i == 0 else i - 1
                attrs.append(torch.tensor(
                    edge_attr_1d(grids[lev], th_levels[lev], ei),
                    dtype=torch.float32))
            out.append((torch.tensor(x, dtype=torch.float32), attrs,
                        y[j]))
        return out

    data_train = sample_data(train_a, train_u_enc)
    data_test = sample_data(test_a, test_u)   # targets un-encoded

    model = MGKNOrthogonal1D(args.width, args.ker_width, args.depth,
                             ker_in=4, in_width=2, s=s)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr,
                           weight_decay=5e-4)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=args.scheduler_step, gamma=args.scheduler_gamma)
    lp = RelLpLoss(size_average=False)

    hist = []
    order = np.arange(len(data_train))
    shuffle_rng = np.random.default_rng(args.seed)
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        shuffle_rng.shuffle(order)
        tr_l2 = 0.0
        model.train()
        for gi in order:
            x, attrs, y = data_train[gi]
            opt.zero_grad()
            out = model(x, edge_lists, attrs)
            l2 = lp(u_norm.decode(out.view(1, -1)),
                    u_norm.decode(y.view(1, -1)))
            l2.backward()
            opt.step()
            tr_l2 += float(l2)
        sched.step()
        hist.append(tr_l2 / len(data_train))
        print(f"epoch {ep}: train_l2={hist[-1]:.5f} "
              f"({time.perf_counter()-t0:.1f} s)", flush=True)

    model.eval()
    test_l2 = 0.0
    with torch.no_grad():
        for x, attrs, y in data_test:
            out = u_norm.decode(model(x, edge_lists, attrs).view(1, -1))
            test_l2 += float(lp(out, y.view(1, -1)))
    test_l2 /= len(data_test)
    print(f"test rel_l2={test_l2:.5f}", flush=True)

    result = {"protocol": "mgkn_orthogonal_oracle_ab", "side": "torch",
              "seed": args.seed, "config": vars(args),
              "train_l2": hist, "final_train_l2": hist[-1],
              "final_test_l2": test_l2}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(json.dumps({k: result[k] for k in
                      ("side", "seed", "final_train_l2",
                       "final_test_l2")}))


if __name__ == "__main__":
    main()
