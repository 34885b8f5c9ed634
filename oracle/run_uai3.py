"""Torch oracle: the UAI3_resolution.py protocol (GKN, Nystrom, multires
zero-shot eval) at a configurable scale.

Reproduces graph-neural-operator/UAI3_resolution.py:36-270 semantics:
ScalarGaussian-normalized coeff/Kcoeff/Kcoeff_x/Kcoeff_y/sol, Nystrom
m-node radius-0.25 graphs (k per train sample), KernelNN3 (shared
mean-aggr edge conv, ReLU every iteration), Adam(lr, weight_decay=5e-4)
+ StepLR, MSE backward on encoded outputs, decoded rel-L2 metric,
zero-shot eval of the SAME weights on fresh Nystrom graphs built at
other resolutions from strided-downsampled test fields
(UAI3_resolution.py:107-124, 148-190, 240-265).

Scale knobs default to the single-core-CPU A/B protocol (docs/ORACLE.md);
the JAX side runs the identical config via
`cli run uai3_resolution --set ...`.

Usage:
    nice -n 19 python -m oracle.run_uai3 --data results/oracle_data \
        --seed 0 --out results/oracle_uai3_torch_s0.json
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn.functional as F

from .torch_ref import (GKN3, NystromRadiusMesh, RelLpLoss,
                        ScalarGaussianNormalizer)


FIELDS = ("coeff", "Kcoeff", "Kcoeff_x", "Kcoeff_y")


def load_darcy(path, n):
    from scipy.io import loadmat

    raw = loadmat(path)
    return {k: torch.tensor(raw[k][:n], dtype=torch.float32)
            for k in FIELDS + ("sol",)}


def build_graphs(fields_flat, y_flat, s, m, radius, k_per_sample, gen):
    """One (x, edge_index, edge_attr, y, idx) tuple per graph; theta for
    edge attrs is the encoded coeff field (UAI3_resolution.py:139)."""
    n = y_flat.shape[0]
    mesh = NystromRadiusMesh(s, m, gen)
    graphs = []
    for j in range(n):
        for _ in range(k_per_sample):
            idx = mesh.sample()
            ei = mesh.radius_edges(radius)
            attr = mesh.edge_attributes(fields_flat[0][j].numpy())
            x = mesh.node_features([f[j].numpy() for f in fields_flat])
            graphs.append((
                torch.tensor(x, dtype=torch.float32),
                torch.tensor(ei, dtype=torch.long),
                torch.tensor(attr, dtype=torch.float32),
                y_flat[j][idx],
                idx,
            ))
    return graphs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="results/oracle_data")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    # the scaled A/B protocol (identical on the JAX side)
    ap.add_argument("--r", type=int, default=4)          # train s = 61
    ap.add_argument("--ntrain", type=int, default=100)
    ap.add_argument("--ntest", type=int, default=20)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--radius", type=float, default=0.25)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--ker-width", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--scheduler-step", type=int, default=20)
    ap.add_argument("--scheduler-gamma", type=float, default=0.5)
    ap.add_argument("--eval-res", type=int, nargs="*",
                    default=[61, 121, 241])
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    gen = torch.Generator().manual_seed(args.seed)

    src = 241
    s = (src - 1) // args.r + 1
    train = load_darcy(f"{args.data}/darcy_train.mat", args.ntrain)
    test = load_darcy(f"{args.data}/darcy_test.mat", args.ntest)

    # strided downsample + flatten, then per-field scalar normalizers
    # fitted on TRAIN (UAI3_resolution.py:78-105)
    def flat(t, r):
        return t[:, ::r, ::r].reshape(t.shape[0], -1)

    norms = {k: ScalarGaussianNormalizer(flat(train[k], args.r))
             for k in FIELDS}
    train_in = [norms[k].encode(flat(train[k], args.r)) for k in FIELDS]
    u_norm = ScalarGaussianNormalizer(flat(train["sol"], args.r))
    train_u = u_norm.encode(flat(train["sol"], args.r))

    graphs = build_graphs(train_in, train_u, s, args.m, args.radius,
                          args.k, gen)

    # test graphs per eval resolution (test targets stay UN-encoded,
    # UAI3_resolution.py:126-128, 243-265)
    eval_sets = {}
    for s_eval in args.eval_res:
        r_eval = (src - 1) // (s_eval - 1)
        tin = [norms[k].encode(flat(test[k], r_eval)) for k in FIELDS]
        tu = flat(test["sol"], r_eval)
        eval_sets[s_eval] = build_graphs(tin, tu, s_eval, args.m,
                                         args.radius, 1, gen)

    model = GKN3(args.width, args.ker_width, args.depth,
                 ker_in=6, in_width=6)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr,
                           weight_decay=5e-4)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=args.scheduler_step, gamma=args.scheduler_gamma)
    lp = RelLpLoss(size_average=False)

    hist = []
    order = np.arange(len(graphs))
    shuffle_rng = np.random.default_rng(args.seed)
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        shuffle_rng.shuffle(order)
        tr_mse = tr_l2 = 0.0
        model.train()
        for gi in order:
            x, ei, attr, y, idx = graphs[gi]
            opt.zero_grad()
            out = model(x, ei, attr)
            mse = F.mse_loss(out.view(-1, 1), y.view(-1, 1))
            mse.backward()
            opt.step()
            with torch.no_grad():
                tr_l2 += float(lp(u_norm.decode(out.view(1, -1)),
                                  u_norm.decode(y.view(1, -1))))
            tr_mse += float(mse)
        sched.step()
        hist.append(tr_l2 / len(graphs))
        print(f"epoch {ep}: train_mse={tr_mse/len(graphs):.6f} "
              f"train_l2={hist[-1]:.5f} "
              f"({time.perf_counter()-t0:.1f} s)", flush=True)

    model.eval()
    multires = {}
    with torch.no_grad():
        for s_eval, gs in eval_sets.items():
            tot = 0.0
            for x, ei, attr, y, idx in gs:
                out = u_norm.decode(model(x, ei, attr).view(1, -1))
                tot += float(lp(out, y.view(1, -1)))
            multires[s_eval] = tot / len(gs)
            print(f"zero-shot s={s_eval}: rel_l2={multires[s_eval]:.5f}",
                  flush=True)

    result = {"protocol": "uai3_oracle_ab", "side": "torch",
              "seed": args.seed, "config": vars(args),
              "train_l2": hist, "final_train_l2": hist[-1],
              "multires": multires}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    print(json.dumps({k: result[k] for k in
                      ("side", "seed", "final_train_l2", "multires")}))


if __name__ == "__main__":
    main()
