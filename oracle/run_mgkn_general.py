"""Torch oracle: the MGKN_general_darcy2d.py protocol (multilevel
random meshes, MKGN V-cycle, decoded-rel-L2 backward) at a
configurable scale.

Reproduces multipole-graph-neural-operator/MGKN_general_darcy2d.py
semantics:
  - RandomMultiMeshGenerator (utilities.py:546-690): one torch.randperm
    partitioned into per-level node sets; per-level inner radius edges
    and down/up inter-level edges on GLOBAL (concatenated) indices;
    6-feature edge attributes [pos_src, pos_dst, theta_src, theta_dst]
    from the concatenated sample grid (utilities.py:670-700).
  - MKGN module (MGKN_general_darcy2d.py:21-95): fc_in; per-depth
    V-cycle of residual+ReLU down convs (NNConv mean, no root/bias,
    kernel [6, kw/2^l, w^2]), in-place-slice mid convs (root weight, no
    bias, kernel [6, kw/2^l, kw/2^l, w^2]), residual+ReLU up convs;
    decoder fc_out2(relu(fc_out1(x[:m0]))).
  - Training (MGKN_general_darcy2d.py:252-285): Adam(lr, wd=5e-4) +
    StepLR, batch 1, loss = rel-L2 of POINTWISE-decoded outputs
    (UnitGaussianNormalizer with sample_idx) — the decoded metric IS
    the backward signal.
  - Scalar-Gaussian-encoded coeff/Kcoeff/grads node features +
    encoded-coeff theta (MGKN_general_darcy2d.py:176-199).

Eval here uses fresh sampled test graphs with the SAME train metric
(decoded rel-L2 on level-0 nodes) — identical on the JAX side via
oracle.run_jax --protocol mgkn_general, so the A/B compares like with
like. (The reference's splitter/assembler full-field eval is covered
separately by graph/splitters.py parity tests and the JAX runner's
full_field_l2.)

Usage:
    nice -n 19 python -m oracle.run_mgkn_general \
        --data results/oracle_data --seed 0 \
        --out results/oracle/mgkn_general_torch_s0.json
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn.functional as F

from .torch_ref import (EdgeKernelConvMean, KernelMLP,
                        PointwiseGaussianNormalizer, RelLpLoss,
                        ScalarGaussianNormalizer)


FIELDS = ("coeff", "Kcoeff", "Kcoeff_x", "Kcoeff_y")


class MultiMesh:
    """RandomMultiMeshGenerator semantics (utilities.py:546-690), 2-D
    box grid, torch.Generator-seeded sampling."""

    def __init__(self, s: int, sample_sizes, generator: torch.Generator):
        xs = np.linspace(0.0, 1.0, s)
        gx, gy = np.meshgrid(xs, xs)
        self.grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
        self.n = s * s
        self.m = list(sample_sizes)
        self.level = len(self.m)
        self.gen = generator

    def sample(self):
        perm = torch.randperm(self.n, generator=self.gen).numpy()
        self.idx = []
        index = 0
        for l in range(self.level):
            self.idx.append(perm[index: index + self.m[l]])
            index += self.m[l]
        self.idx_all = perm[:index]
        self.grid_sample = [self.grid[i] for i in self.idx]
        self.grid_sample_all = self.grid[self.idx_all]
        return self.idx, self.idx_all

    def connectivity(self, radius_inner, radius_inter):
        """Per-level inner + down/up inter edges on global indices
        (utilities.py:602-640); distance-0 self loops kept."""
        def pwd(a, b):
            d = a[:, None, :] - b[None, :, :]
            return np.sqrt((d ** 2).sum(-1))

        self.edge_index = []
        index = 0
        for l in range(self.level):
            ei = np.vstack(np.where(
                pwd(self.grid_sample[l], self.grid_sample[l])
                <= radius_inner[l])) + index
            self.edge_index.append(ei)
            index += self.m[l]

        self.edge_index_down = []
        self.edge_index_up = []
        index = 0
        for l in range(self.level - 1):
            ei = np.vstack(np.where(
                pwd(self.grid_sample[l], self.grid_sample[l + 1])
                <= radius_inter[l])) + index
            ei[1, :] += self.m[l]
            self.edge_index_down.append(ei)
            self.edge_index_up.append(ei[[1, 0], :])
            index += self.m[l]
        return self.edge_index, self.edge_index_down, self.edge_index_up

    def attributes(self, theta_flat):
        """6-col attrs [pos_src(2), pos_dst(2), theta_src, theta_dst]
        from the concatenated sample grid (utilities.py:670-700)."""
        th = np.asarray(theta_flat)[self.idx_all]

        def attr(ei):
            return np.concatenate(
                [self.grid_sample_all[ei[0]], self.grid_sample_all[ei[1]],
                 th[ei[0]][:, None], th[ei[1]][:, None]], axis=1)

        return ([attr(ei) for ei in self.edge_index],
                [attr(ei) for ei in self.edge_index_down],
                [attr(ei) for ei in self.edge_index_up])


class MultiMeshSplit(MultiMesh):
    """RandomMultiMeshSplitter semantics (utilities.py:786-1007): ONE
    randperm shared by all splits; split i takes the level-0 window
    perm[i*m0 : i*m0+m0] (wrapping mod n), levels 1+ continue after it;
    the assembler scatters level-0 predictions into the full field
    (later splits overwrite overlapping points)."""

    def __init__(self, s, sample_sizes, generator):
        super().__init__(s, sample_sizes, generator)
        self.splits = self.n // self.m[0]
        if self.splits * self.m[0] < self.n:
            self.splits += 1
        self.perm = None

    def sample_window(self, new_sample, index0):
        if new_sample or self.perm is None:
            self.perm = torch.randperm(self.n,
                                       generator=self.gen).numpy()
        self.idx = []
        index = index0
        for l in range(self.level):
            index = index % self.n
            index_end = (index + self.m[l]) % self.n
            if index < index_end:
                idx = self.perm[index: index_end]
            else:
                idx = np.concatenate([self.perm[index:],
                                      self.perm[:index_end]])
            self.idx.append(idx)
            index = index_end
        if index0 < index_end:
            self.idx_all = self.perm[index0: index_end]
        else:
            self.idx_all = np.concatenate([self.perm[index0:],
                                           self.perm[:index_end]])
        self.grid_sample = [self.grid[i] for i in self.idx]
        self.grid_sample_all = self.grid[self.idx_all]
        return self.idx, self.idx_all


class MKGNGeneral(torch.nn.Module):
    """MKGN of MGKN_general_darcy2d.py:21-95 (see module docstring)."""

    def __init__(self, width, ker_width, depth, ker_in, points, level,
                 in_width):
        super().__init__()
        self.depth = depth
        self.level = level
        self.points = [0]
        acc = 0
        for p in points:
            acc += p
            self.points.append(acc)

        self.fc_in = torch.nn.Linear(in_width, width)
        self.conv_down = torch.nn.ModuleList([
            EdgeKernelConvMean(
                width,
                KernelMLP([ker_in, ker_width // (2 ** l), width ** 2]),
                root_weight=False, bias=False)
            for l in range(1, level)])
        self.conv_mid = torch.nn.ModuleList([
            EdgeKernelConvMean(
                width,
                KernelMLP([ker_in, ker_width // (2 ** l),
                           ker_width // (2 ** l), width ** 2]),
                root_weight=True, bias=False)
            for l in range(level)])
        self.conv_up = torch.nn.ModuleList([
            EdgeKernelConvMean(
                width,
                KernelMLP([ker_in, ker_width // (2 ** l), width ** 2]),
                root_weight=False, bias=False)
            for l in range(1, level)])
        self.fc_out1 = torch.nn.Linear(width, ker_width)
        self.fc_out2 = torch.nn.Linear(ker_width, 1)

    def forward(self, x, ei_mid, attr_mid, ei_down, attr_down, ei_up,
                attr_up):
        x = self.fc_in(x)
        pts = self.points
        for _ in range(self.depth):
            for l in range(self.level - 1):
                x = x + self.conv_down[l](x, ei_down[l], attr_down[l])
                x = F.relu(x)
            for l in reversed(range(self.level)):
                sl = x[pts[l]: pts[l + 1]].clone()
                x = x.clone()
                x[pts[l]: pts[l + 1]] = self.conv_mid[l](
                    sl, ei_mid[l] - pts[l], attr_mid[l])
                if l > 0:
                    x = x + self.conv_up[l - 1](x, ei_up[l - 1],
                                                attr_up[l - 1])
                    x = F.relu(x)
        x = F.relu(self.fc_out1(x[: pts[1]]))
        return self.fc_out2(x)


def load_darcy(path, n):
    from scipy.io import loadmat

    raw = loadmat(path)
    return {k: torch.tensor(raw[k][:n], dtype=torch.float32)
            for k in FIELDS + ("sol",)}


def build_graphs(enc, y_enc, s, args, gen):
    mesh = MultiMesh(s, args.m, gen)
    n = y_enc.shape[0]
    graphs = []
    for j in range(n):
        idx, idx_all = mesh.sample()
        ei_mid, ei_down, ei_up = mesh.connectivity(args.radius_inner,
                                                   args.radius_inter)
        a_mid, a_down, a_up = mesh.attributes(enc[0][j].numpy())
        x = np.concatenate(
            [mesh.grid_sample_all]
            + [np.asarray(f[j])[idx_all][:, None] for f in enc], axis=1)
        tt = lambda a: torch.tensor(a, dtype=torch.float32)
        tl = lambda a: torch.tensor(np.ascontiguousarray(a),
                                    dtype=torch.long)
        graphs.append(dict(
            x=tt(x),
            ei_mid=[tl(e) for e in ei_mid],
            attr_mid=[tt(a) for a in a_mid],
            ei_down=[tl(e) for e in ei_down],
            attr_down=[tt(a) for a in a_down],
            ei_up=[tl(e) for e in ei_up],
            attr_up=[tt(a) for a in a_up],
            y=y_enc[j][idx[0]],
            sample_idx=torch.tensor(np.ascontiguousarray(idx[0]),
                                    dtype=torch.long),
        ))
    return graphs


def run_full_field_eval(model, enc_te, sol_raw, u_norm, lp, s, args,
                        gen, n_eval):
    """Reference eval path (MGKN_general_darcy2d.py:306-332): split the
    full s*s grid into rotating level-0 windows, predict each split,
    assemble the decoded level-0 predictions into the full field, and
    score rel-L2 against the RAW full solution."""
    mesh = MultiMeshSplit(s, args.m, gen)
    tt = lambda a: torch.tensor(a, dtype=torch.float32)
    tl = lambda a: torch.tensor(np.ascontiguousarray(a),
                                dtype=torch.long)
    total = 0.0
    with torch.no_grad():
        for j in range(n_eval):
            pred = np.zeros(mesh.n, dtype=np.float64)
            index = 0
            for i in range(mesh.splits):
                mesh.sample_window(i == 0, index)
                index = (index + mesh.m[0]) % mesh.n
                ei_mid, ei_down, ei_up = mesh.connectivity(
                    args.radius_inner, args.radius_inter)
                a_mid, a_down, a_up = mesh.attributes(
                    enc_te[0][j].numpy())
                x = np.concatenate(
                    [mesh.grid_sample_all]
                    + [np.asarray(f[j])[mesh.idx_all][:, None]
                       for f in enc_te], axis=1)
                out = model(tt(x), [tl(e) for e in ei_mid],
                            [tt(a) for a in a_mid],
                            [tl(e) for e in ei_down],
                            [tt(a) for a in a_down],
                            [tl(e) for e in ei_up],
                            [tt(a) for a in a_up])
                idx0 = mesh.idx[0]
                dec = u_norm.decode(out.view(1, -1),
                                    sample_idx=tl(idx0).view(1, -1))
                pred[idx0] = np.asarray(dec)[0]
            total += float(lp(tt(pred).view(1, -1),
                              sol_raw[j].view(1, -1)))
    return total / n_eval


def run_eval(model, graphs, u_norm, lp):
    total = 0.0
    with torch.no_grad():
        for g in graphs:
            out = model(g["x"], g["ei_mid"], g["attr_mid"], g["ei_down"],
                        g["attr_down"], g["ei_up"], g["attr_up"])
            dec = u_norm.decode(out.view(1, -1),
                                sample_idx=g["sample_idx"].view(1, -1))
            ydec = u_norm.decode(g["y"].view(1, -1),
                                 sample_idx=g["sample_idx"].view(1, -1))
            total += float(lp(dec, ydec))
    return total / len(graphs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="results/oracle_data")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    # the scaled A/B protocol (identical on the JAX side)
    ap.add_argument("--r", type=int, default=4)          # train s = 61
    ap.add_argument("--ntrain", type=int, default=32)
    ap.add_argument("--ntest", type=int, default=10)
    ap.add_argument("--m", type=int, nargs="*", default=[100, 50, 12])
    ap.add_argument("--radius-inner", type=float, nargs="*",
                    default=[0.25, 0.5, 1.0])
    ap.add_argument("--radius-inter", type=float, nargs="*",
                    default=[0.125, 0.25])
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--ker-width", type=int, default=64)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--scheduler-step", type=int, default=10)
    ap.add_argument("--scheduler-gamma", type=float, default=0.8)
    # full-field split/assemble eval samples (matches the JAX runner's
    # _eval_mgkn_split n_eval = min(ntest, 5))
    ap.add_argument("--full-field-n", type=int, default=5)
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    gen = torch.Generator().manual_seed(args.seed * 7919 + 13)

    tr = load_darcy(f"{args.data}/darcy_train.mat", args.ntrain)
    te = load_darcy(f"{args.data}/darcy_test.mat", args.ntest)
    r, s0 = args.r, tr["coeff"].shape[1]
    s = int((s0 - 1) / r) + 1

    def flat(d, n):
        return {k: v[:n, ::r, ::r].reshape(n, -1) for k, v in d.items()}

    tr, te = flat(tr, args.ntrain), flat(te, args.ntest)
    norms = {k: ScalarGaussianNormalizer(tr[k]) for k in FIELDS}
    enc_tr = [norms[k].encode(tr[k]) for k in FIELDS]
    enc_te = [norms[k].encode(te[k]) for k in FIELDS]
    u_norm = PointwiseGaussianNormalizer(tr["sol"])
    ytr = u_norm.encode(tr["sol"])
    yte = u_norm.encode(te["sol"])

    train_graphs = build_graphs(enc_tr, ytr, s, args, gen)
    test_graphs = build_graphs(enc_te, yte, s, args, gen)

    model = MKGNGeneral(width=args.width, ker_width=args.ker_width,
                        depth=args.depth, ker_in=6, points=args.m,
                        level=len(args.m), in_width=6)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr,
                           weight_decay=5e-4)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=args.scheduler_step, gamma=args.scheduler_gamma)
    lp = RelLpLoss()

    hist = []
    order_gen = torch.Generator().manual_seed(args.seed * 104729 + 7)
    for ep in range(args.epochs):
        t0 = time.time()
        tr_l2 = 0.0
        for j in torch.randperm(len(train_graphs),
                                generator=order_gen).tolist():
            g = train_graphs[j]
            opt.zero_grad()
            out = model(g["x"], g["ei_mid"], g["attr_mid"], g["ei_down"],
                        g["attr_down"], g["ei_up"], g["attr_up"])
            dec = u_norm.decode(out.view(1, -1),
                                sample_idx=g["sample_idx"].view(1, -1))
            ydec = u_norm.decode(g["y"].view(1, -1),
                                 sample_idx=g["sample_idx"].view(1, -1))
            l2 = lp(dec, ydec)
            l2.backward()
            opt.step()
            tr_l2 += float(l2)
        sched.step()
        hist.append(tr_l2 / len(train_graphs))
        print(f"epoch {ep}: train_l2={hist[-1]:.5f} "
              f"({time.time() - t0:.1f} s)", flush=True)

    test_l2 = run_eval(model, test_graphs, u_norm, lp)
    print(f"test rel_l2={test_l2:.5f}")
    ff_gen = torch.Generator().manual_seed(args.seed * 15485863 + 3)
    full_field_l2 = run_full_field_eval(
        model, enc_te, te["sol"], u_norm, lp, s, args, ff_gen,
        min(args.ntest, args.full_field_n))
    print(f"full-field (split/assemble) rel_l2={full_field_l2:.5f}")
    result = {"protocol": "mgkn_general_oracle_ab", "side": "torch",
              "seed": args.seed, "config": vars(args),
              "train_l2": hist, "final_train_l2": hist[-1],
              "final_test_l2": test_l2,
              "full_field_l2": full_field_l2}
    print(json.dumps(result)[:200])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
