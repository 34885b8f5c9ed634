"""One runner executing any registered experiment config.

Replaces the reference's 15 per-script train/eval loops (SURVEY.md
section 2.4) with config-driven execution: data -> graphs -> fit -> eval
protocol. Returns a result dict with per-epoch histories and final
decoded rel-L2 metrics (the reference's universal eval metric).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .registry import ExperimentConfig
from ..data import (
    load_or_generate_darcy, load_or_generate_burgers,
    prepare_darcy, prepare_burgers,
    darcy_gkn_graphs, darcy_mgkn_graphs, burgers_gkn_graphs,
    burgers_multipole_data,
)
from ..utils.losses import LpLoss
from ..utils.matio import MatReader


def _load_darcy_fields(cfg: ExperimentConfig, n: int, path: Optional[str],
                       seed: int) -> Dict[str, np.ndarray]:
    if path is not None:
        reader = MatReader(path)
        return {k: reader.read_field(k)[:n]
                for k in ("coeff", "Kcoeff", "Kcoeff_x", "Kcoeff_y", "sol")}
    return load_or_generate_darcy(n, cfg.source_res, seed=seed)


def _load_burgers_fields(cfg: ExperimentConfig, n: int,
                         path: Optional[str], seed: int):
    if path is not None:
        reader = MatReader(path)
        return {k: reader.read_field(k)[:n] for k in ("a", "u")}
    return load_or_generate_burgers(n, cfg.source_res, seed=seed)


def _kernel_layers(cfg: ExperimentConfig, ker_in: int):
    w2 = cfg.width ** 2
    if cfg.kernel_variant == "nn":
        return (ker_in, cfg.ker_width, cfg.ker_width, w2)
    if cfg.kernel_variant == "nn5":
        # UAI8_kernel.py:21 — 5-layer kappa
        return (ker_in, cfg.ker_width // 4, cfg.ker_width // 2,
                cfg.ker_width, w2)
    return (ker_in, cfg.ker_width // 2, cfg.ker_width, w2)


def run_experiment(cfg: ExperimentConfig, smoke: bool = False,
                   progress=None, figures_dir: Optional[str] = None,
                   profile_dir: Optional[str] = None) -> Dict:
    """figures_dir: emit truth/approx/error triptychs for the worst /
    median / best test samples (the reference's per-run visual
    inspection, UAI1_full_resolution.py:335-461). profile_dir: capture a
    jax.profiler trace of the whole run (replaces the reference's
    wall-clock-only bracketing, SURVEY.md section 5)."""
    if smoke:
        cfg = cfg.smoke()

    def dispatch():
        if cfg.family == "gkn":
            return _run_gkn(cfg, progress, figures_dir)
        if cfg.family == "gcn":
            return _run_gcn(cfg, progress)
        if cfg.family == "mgkn_general":
            return _run_mgkn_general(cfg, progress, figures_dir)
        if cfg.family == "mgkn_orthogonal":
            return _run_mgkn_orthogonal(cfg, progress, figures_dir)
        if cfg.family == "torus_t":
            return _run_torus_timeseries(cfg, progress)
        raise ValueError(cfg.family)

    if profile_dir:
        from ..train.metrics import profile_trace

        with profile_trace(profile_dir):
            result = dispatch()
        result["profile_dir"] = profile_dir
        return result
    return dispatch()


def _emit_run_figures(figures_dir: str, cfg, task, params, test_data,
                      coords_dim: int) -> list:
    """Truth/approx/error figures for the WORST / MEDIAN / BEST test
    samples by decoded rel-L2 (reference parity:
    UAI1_full_resolution.py:335-461 saves per-run field images).
    Full-grid samples render as imshow triptychs; Nystrom subsamples as
    scatter triptychs; 1-D fields as line plots."""
    import os

    import jax
    from ..data.datasets import batch_iterator
    from ..train.metrics import (save_field_triptych,
                                 save_points_triptych,
                                 save_line_triptych)

    dec_p, dec_y, masks, coords = [], [], [], []
    sample_idx = []

    @jax.jit
    def fwd(params, batch):
        pred = task.forward(params, batch)
        y = task.targets(batch)
        mask = task.mask(batch)
        return (task.decode(pred[..., 0], batch),
                task.decode(y[..., 0], batch), mask)

    for batch in batch_iterator(test_data, 4, drop_remainder=False):
        p, y, m = jax.device_get(fwd(params, batch))
        dec_p.append(p)
        dec_y.append(y)
        masks.append(np.asarray(m))
        bx = np.asarray(batch.x)
        nmax = p.shape[1]
        coords.append(bx[:, :nmax, :coords_dim])
        si = getattr(batch, "sample_idx", None)
        sample_idx.append(None if si is None
                          else np.asarray(si)[:, :nmax])
    dec_p = np.concatenate(dec_p)
    dec_y = np.concatenate(dec_y)
    masks = np.concatenate(masks)
    coords = np.concatenate(coords)
    sample_idx = (None if sample_idx[0] is None
                  else np.concatenate(sample_idx))

    pm, ym = dec_p * masks, dec_y * masks
    rels = (np.linalg.norm(pm - ym, axis=1)
            / np.maximum(np.linalg.norm(ym, axis=1), 1e-12))
    order = np.argsort(rels)
    picks = {"best": order[0], "median": order[len(order) // 2],
             "worst": order[-1]}
    os.makedirs(figures_dir, exist_ok=True)
    written = []
    for tag, j in picks.items():
        valid = masks[j] > 0
        t, a = dec_y[j][valid], dec_p[j][valid]
        path = os.path.join(figures_dir, f"{cfg.name}_{tag}.png")
        title = f"{cfg.name} {tag} rel-L2={rels[j]:.4f}"
        if coords_dim == 1:
            xs = coords[j][valid, 0]
            o = np.argsort(xs)
            out = save_line_triptych(xs[o], t[o], a[o], path, title)
        else:
            nv = int(valid.sum())
            side = int(round(np.sqrt(nv)))
            full_grid = side * side == nv and (
                sample_idx is None
                or np.array_equal(sample_idx[j][valid][:nv],
                                  np.arange(nv)))
            if full_grid:
                out = save_field_triptych(t, a, path, title)
            else:
                out = save_points_triptych(coords[j][valid], t, a, path,
                                           title)
        if out:
            written.append(out)
    return written


# ------------------------------------------------------------------ GKN

def _run_gkn(cfg: ExperimentConfig, progress=None,
             figures_dir=None) -> Dict:
    import jax
    from ..models import GKNConfig, gkn_init
    from ..train import GKNTask, TrainConfig, fit, evaluate

    fields = _load_darcy_fields(cfg, cfg.ntrain, cfg.data_path,
                                cfg.data_seed) \
        if cfg.dataset == "darcy" else None
    radius_test = cfg.radius_test or cfg.radius_train

    if cfg.dataset == "darcy":
        arrays, norms = prepare_darcy(fields, n=cfg.ntrain,
                                      r=cfg.downsample, u_norm=cfg.u_norm)
        test_fields = _load_darcy_fields(cfg, cfg.ntest,
                                         cfg.test_data_path,
                                         cfg.data_seed + 1)
        test_arrays, _ = prepare_darcy(
            test_fields, n=cfg.ntest, r=cfg.downsample, normalizers=norms,
            u_normalizer=arrays.u_normalizer)
        test_arrays.u = np.asarray(
            arrays.u_normalizer.encode(test_arrays.u))
        if cfg.train_split:
            # UAI7 shard training (UAI7_evaluate.py:131-141): a FIXED
            # set of ntrain*k random downsample-grid shards (stride
            # r=train_split subgrid + random fill to m nodes), labels
            # = encoded u at the shard indices
            train_g = _darcy_shard_train_graphs(cfg, arrays)
        else:
            train_g = darcy_gkn_graphs(
                arrays, m=cfg.nystrom_m, k=cfg.graphs_per_sample,
                radius=cfg.radius_train, seed=cfg.seed,
                node_block=cfg.node_block)
        test_g = darcy_gkn_graphs(
            test_arrays, m=cfg.nystrom_m, radius=radius_test,
            seed=cfg.seed + 1, node_block=cfg.node_block)
        ker_in, in_width = 6, 6
    else:
        bfields = _load_burgers_fields(cfg, cfg.ntrain + cfg.ntest,
                                       cfg.data_path, cfg.data_seed)
        arrays = prepare_burgers(bfields, n=cfg.ntrain, r=cfg.downsample)
        test_arrays = prepare_burgers(
            {k: v[cfg.ntrain:] for k, v in bfields.items()}, n=cfg.ntest,
            r=cfg.downsample, a_normalizer=arrays.a_normalizer,
            u_normalizer=arrays.u_normalizer)
        train_g = burgers_gkn_graphs(arrays, m=cfg.nystrom_m,
                                     k=cfg.graphs_per_sample,
                                     radius=cfg.radius_train, seed=cfg.seed)
        test_g = burgers_gkn_graphs(test_arrays, m=cfg.nystrom_m,
                                    radius=radius_test, seed=cfg.seed + 1)
        ker_in, in_width = 4, 2

    mcfg = GKNConfig(
        width=cfg.width, ker_width=cfg.ker_width, depth=cfg.depth,
        ker_in=ker_in, in_width=in_width,
        kernel_layers=_kernel_layers(cfg, ker_in),
        relu_last=(cfg.relu_last or cfg.kernel_variant == "nn"),
        decoder_mlp=cfg.decoder_mlp, impl=cfg.impl,
        compute_dtype=cfg.compute_dtype, k_storage=cfg.k_storage)
    params = gkn_init(jax.random.PRNGKey(cfg.seed), mcfg)
    # per-node (unit) stats must be gathered at each node's grid index;
    # padded node arrays make direct broadcasting impossible
    task = GKNTask(mcfg, u_normalizer=arrays.u_normalizer,
                   loss_type=cfg.loss,
                   use_sample_idx=cfg.u_norm == "unit")
    tc = TrainConfig(epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate,
                     weight_decay=cfg.weight_decay,
                     scheduler_step=cfg.scheduler_step,
                     scheduler_gamma=cfg.scheduler_gamma, loss=cfg.loss,
                     seed=cfg.seed, epochs_per_jit=cfg.epochs_per_jit)
    res = fit(task, params, train_g, tc, test_data=test_g,
              callback=progress)
    result = {
        "config": cfg.name,
        "train_l2": res.train_l2,
        "test_l2": res.test_l2,
        "test_epochs": res.test_epochs,
        "epoch_times": res.epoch_times,
        "final_test_l2": res.test_l2[-1] if res.test_l2 else None,
    }
    if figures_dir:
        result["figures"] = _emit_run_figures(
            figures_dir, cfg, task, res.params, test_g,
            coords_dim=2 if cfg.dataset == "darcy" else 1)

    if cfg.eval_protocol == "multires" and cfg.dataset == "darcy":
        result["multires"], result["multires_fresh_fields"] = \
            _eval_gkn_multires(cfg, mcfg, res.params, arrays, norms,
                               radius_test)
    elif cfg.eval_protocol == "split_random" and cfg.dataset == "darcy":
        result.update(_eval_gkn_split_random(
            cfg, mcfg, res.params, arrays, norms))
    elif cfg.eval_protocol == "split_random" and cfg.dataset == "burgers":
        result["full_field_l2"] = _eval_gkn_split_random_burgers(
            cfg, mcfg, res.params, arrays)
    elif cfg.eval_protocol == "split_downsample":
        result.update(_eval_gkn_split_downsample(
            cfg, mcfg, res.params, arrays, norms))
    if cfg.eval_m and cfg.dataset == "darcy":
        # test-side node-count generalization (UAI5_sample_generalize.py):
        # the same weights evaluated on graphs subsampled at other m
        from ..train import GKNTask as _T, evaluate as _ev

        by_m = {}
        for m_eval in cfg.eval_m:
            g_m = darcy_gkn_graphs(test_arrays, m=m_eval,
                                   radius=radius_test, seed=cfg.seed + 5)
            t_m = _T(mcfg, u_normalizer=arrays.u_normalizer,
                     loss_type=cfg.loss,
                     use_sample_idx=cfg.u_norm == "unit")
            by_m[int(m_eval)] = _ev(t_m, res.params, g_m,
                                    batch_size=cfg.batch_size)
        result["eval_by_m"] = by_m
    result["params"] = res.params
    # serving-bundle payload (cli run --bundle): everything
    # inference.GKNPredictor / train.export needs besides the params
    if cfg.dataset == "darcy":
        bundle_norms = dict(norms)
        bundle_norms["u"] = arrays.u_normalizer
    else:
        bundle_norms = {"a": arrays.a_normalizer,
                        "u": arrays.u_normalizer}
    result["_bundle"] = {
        "model_cfg": mcfg,
        "normalizers": bundle_norms,
        "extra": {"family": "gkn", "dataset": cfg.dataset,
                  "radius": radius_test, "experiment": cfg.name},
    }
    return result


def _eval_gkn_split_random_burgers(cfg, mcfg, params, arrays):
    """1-d full-grid eval via RandomGridSplitter (neurips5_GKN.py:138-147):
    cover all s points with disjoint m-node subgraphs, stitch, rel-L2."""
    from ..graph import RandomGridSplitter, make_box_grid

    s = arrays.s
    n_eval = min(cfg.ntest, 10)
    bfields = _load_burgers_fields(cfg, cfg.ntrain + cfg.ntest,
                                   cfg.data_path, cfg.data_seed)
    test = prepare_burgers(
        {k: v[cfg.ntrain:] for k, v in bfields.items()}, n=n_eval,
        r=cfg.downsample, a_normalizer=arrays.a_normalizer,
        u_normalizer=arrays.u_normalizer, encode_u=False)
    m = _divisor_near(s, cfg.nystrom_m or 128)
    grid = make_box_grid([[0, 1]], [s])
    sp = RandomGridSplitter(grid, s, d=1, m=m, l=1,
                            radius=cfg.radius_train, seed=cfg.seed)
    lp = LpLoss(size_average=False)
    total = 0.0
    for j in range(n_eval):
        graphs = sp.get_data(test.a[j][:, None])
        preds = _predict_shards(mcfg, params, graphs)
        idxs = [np.asarray(g.sample_idx)[: int(g.n_node)] for g in graphs]
        dec = [np.asarray(arrays.u_normalizer.decode(
            p[None, :], sample_idx=idx[None]))[0]
            for p, idx in zip(preds, idxs)]
        full = sp.assemble(dec, idxs)
        total += float(lp.rel(full[None], test.u[j][None]))
    return total / n_eval


def _eval_gkn_multires(cfg, mcfg, params, arrays, norms, radius_test):
    """Zero-shot resolution generalization (UAI3_resolution.py:240-265):
    the SAME weights evaluated on graphs built at other resolutions."""
    from ..train import GKNTask, evaluate

    out = {}
    fresh = []
    for s_eval in cfg.eval_resolutions:
        derivable = (cfg.source_res >= s_eval
                     and (cfg.source_res - 1) % (s_eval - 1) == 0)
        if derivable:
            # strided-downsample the SAME test fields — the reference
            # evaluates identical samples at every resolution
            # (UAI3_resolution.py:107-124)
            fields = _load_darcy_fields(cfg, cfg.ntest, cfg.test_data_path,
                                        cfg.data_seed + 2)
            r = (cfg.source_res - 1) // (s_eval - 1)
        else:
            # source grid cannot produce s_eval; generate at that grid.
            # These entries measure a FRESHLY GENERATED test distribution,
            # not the strided protocol — flagged in the result so they
            # are never silently compared against derivable points.
            import warnings

            warnings.warn(
                f"multires eval at s={s_eval}: source grid "
                f"{cfg.source_res} cannot derive it; using freshly "
                "generated fields (flagged in multires_fresh_fields)")
            fresh.append(int(s_eval))
            fields = load_or_generate_darcy(
                cfg.ntest, s_eval, seed=cfg.data_seed + 2)
            r = 1
        test_arrays, _ = prepare_darcy(
            fields, n=cfg.ntest, r=r, normalizers=norms,
            u_normalizer=arrays.u_normalizer)
        test_arrays.u = np.asarray(
            arrays.u_normalizer.encode(test_arrays.u))
        m = cfg.nystrom_m
        g = darcy_gkn_graphs(test_arrays, m=m, radius=radius_test,
                             seed=cfg.seed + 3)
        task = GKNTask(mcfg, u_normalizer=arrays.u_normalizer,
                       loss_type=cfg.loss,
                       use_sample_idx=cfg.u_norm == "unit")
        out[int(test_arrays.s)] = evaluate(task, params, g,
                                           batch_size=cfg.batch_size)
    return out, fresh


def _predict_shards(mcfg, params, graphs):
    import jax
    from ..models import gkn_apply

    fwd = jax.jit(lambda g: gkn_apply(params, mcfg, g))
    preds = []
    for g in graphs:
        out = np.asarray(fwd(g))[:, 0]
        preds.append(out[: int(g.n_node)])
    return preds


def _darcy_shard_train_graphs(cfg, arrays):
    """Fixed ntrain*k DownsampleGridSplitter training shards with
    labels (UAI7_evaluate.py:131-141: gridsplitter.sample(theta, y) per
    (sample, repeat); the DataLoader then shuffles the fixed list)."""
    from ..graph import (DownsampleGridSplitter, make_box_grid,
                         repad_edges, stack_graphs)

    s = arrays.s
    grid = make_box_grid([[0, 1], [0, 1]], [s, s])
    # m >= the largest shard's subgrid (the x=0,y=0 one) makes sp.sample
    # fill EVERY shard to exactly m nodes -> uniform node capacity
    sub = (s - 1) // cfg.train_split + 1 if s % 2 == 1 \
        else s // cfg.train_split
    m = max(cfg.nystrom_m or sub * sub, sub * sub)
    sp = DownsampleGridSplitter(grid, s, r=cfg.train_split, m=m,
                                radius=cfg.radius_train, seed=cfg.seed)
    graphs = []
    for j in range(cfg.ntrain):
        theta = np.stack([arrays.a[j], arrays.a_smooth[j],
                          arrays.a_gradx[j], arrays.a_grady[j]], axis=1)
        for _ in range(cfg.graphs_per_sample):
            g, _xy = sp.sample(theta, arrays.u[j])
            graphs.append(g)
    cap = max(int(g.senders.shape[0]) for g in graphs)
    return stack_graphs(
        [repad_edges(g, cap) if int(g.senders.shape[0]) != cap else g
         for g in graphs])


def _eval_gkn_split_random(cfg, mcfg, params, arrays, norms):
    """Full-field eval via RandomGridSplitter (UAI7_evaluate2.py:150-161)."""
    from ..graph import RandomGridSplitter, make_box_grid
    from ..data import load_or_generate_darcy

    s = arrays.s
    fields = _load_darcy_fields(cfg, min(cfg.ntest, 10),
                                cfg.test_data_path, cfg.data_seed + 2)
    test_arrays, _ = prepare_darcy(fields, n=min(cfg.ntest, 10),
                                   r=cfg.downsample, normalizers=norms,
                                   u_normalizer=arrays.u_normalizer)
    grid = make_box_grid([[0, 1], [0, 1]], [s, s])
    m = cfg.nystrom_m or 200
    n = s * s
    m = _divisor_near(n, m)
    sp = RandomGridSplitter(grid, s, d=2, m=m, l=cfg.split_l,
                            radius=cfg.radius_train, seed=cfg.seed)
    lp = LpLoss(size_average=False)
    total = 0.0
    shard_total = 0.0
    shard_count = 0
    count = 0
    for j in range(test_arrays.a.shape[0]):
        theta = np.stack([test_arrays.a[j], test_arrays.a_smooth[j],
                          test_arrays.a_gradx[j], test_arrays.a_grady[j]],
                         axis=1)
        graphs = sp.get_data(theta)
        preds = _predict_shards(mcfg, params, graphs)
        idxs = [np.asarray(g.sample_idx)[: int(g.n_node)] for g in graphs]
        for p, idx in zip(preds, idxs):
            # per-shard (subsampled) error companion — decoded with the
            # shard's own per-point stats
            d = arrays.u_normalizer.decode(p[None, :], sample_idx=idx[None]) \
                if cfg.u_norm == "unit" else \
                arrays.u_normalizer.decode(p[None, :])
            truth_idx = test_arrays.u[j][idx]
            shard_total += float(lp.rel(np.asarray(d)[0][None],
                                        truth_idx[None]))
            shard_count += 1
        # reference order (UAI7_evaluate2.py:222-231): assemble the
        # ENCODED shard predictions, then decode the full field with
        # the full-grid stats (no sample_idx)
        full_enc = sp.assemble(preds, idxs)
        full = np.asarray(
            arrays.u_normalizer.decode(full_enc[None, :]))[0]
        truth = test_arrays.u[j]  # un-encoded (prepare with u_normalizer
        # passed -> no encode)
        total += float(lp.rel(full[None], truth[None]))
        count += 1
    return {"full_field_l2": total / max(count, 1),
            "shard_l2": shard_total / max(shard_count, 1)}


def _eval_gkn_split_downsample(cfg, mcfg, params, arrays, norms):
    """Full-field eval via DownsampleGridSplitter + smoothing
    (UAI7_evaluate.py:218-229)."""
    from ..graph import DownsampleGridSplitter, make_box_grid
    from ..data import load_or_generate_darcy

    s = arrays.s
    fields = _load_darcy_fields(cfg, min(cfg.ntest, 10),
                                cfg.test_data_path, cfg.data_seed + 2)
    test_arrays, _ = prepare_darcy(fields, n=min(cfg.ntest, 10),
                                   r=cfg.downsample, normalizers=norms,
                                   u_normalizer=arrays.u_normalizer)
    grid = make_box_grid([[0, 1], [0, 1]], [s, s])
    # reference (UAI7_evaluate.py:174-176): test splitter stride equals
    # the training stride; fall back to the sqrt heuristic otherwise
    r = cfg.train_split or max(2, int(round(s / np.sqrt(cfg.nystrom_m
                                                        or 200))))
    sub = ((s - 1) // r + 1 if s % 2 == 1 else s // r)
    m = max(cfg.nystrom_m or sub * sub, sub * sub)
    sp = DownsampleGridSplitter(grid, s, r=r, m=m,
                                radius=cfg.radius_train, seed=cfg.seed)
    lp = LpLoss(size_average=False)
    total = 0.0
    shard_total = 0.0
    shard_count = 0
    count = 0
    for j in range(test_arrays.a.shape[0]):
        theta = np.stack([test_arrays.a[j], test_arrays.a_smooth[j],
                          test_arrays.a_gradx[j], test_arrays.a_grady[j]],
                         axis=1)
        shards = sp.get_data(theta)
        graphs = [g for g, xy in shards]
        xys = [xy for g, xy in shards]
        preds = _predict_shards(mcfg, params, graphs)
        for p, g in zip(preds, graphs):
            idx = np.asarray(g.sample_idx)[: len(p)]
            d = arrays.u_normalizer.decode(p[None, :], sample_idx=idx[None]) \
                if cfg.u_norm == "unit" else \
                arrays.u_normalizer.decode(p[None, :])
            truth_idx = test_arrays.u[j][idx]
            shard_total += float(lp.rel(np.asarray(d)[0][None],
                                        truth_idx[None]))
            shard_count += 1
        # reference order (UAI7_evaluate.py:218-229 + mp:1122-1151):
        # re-interleave + sigma=1 gaussian-smooth the ENCODED shard
        # predictions, then decode the full field (no sample_idx)
        full_enc = sp.assemble(preds, xys, sigma=1.0)
        full = np.asarray(
            arrays.u_normalizer.decode(full_enc[None, :]))[0]
        truth = test_arrays.u[j]
        total += float(lp.rel(full[None], truth[None]))
        count += 1
    return {"full_field_l2": total / max(count, 1),
            "shard_l2": shard_total / max(shard_count, 1)}


def _divisor_near(n: int, m: int) -> int:
    """Largest divisor of n that is <= m (RandomGridSplitter needs
    n % m == 0)."""
    best = 1
    for d in range(1, int(np.sqrt(n)) + 1):
        if n % d == 0:
            for c in (d, n // d):
                if c <= m:
                    best = max(best, c)
    return best


# ------------------------------------------------------------------ GCN

def _run_gcn(cfg: ExperimentConfig, progress=None) -> Dict:
    """neurips4_GCN.py protocol: GCN on the full-grid 4-neighbor lattice,
    decoded-rel-L2 backward (lines 178-198), held-out test eval (lines
    205-216). The lattice is sample-independent, so ONE template Graph
    carries the edge structure and the stacked data is a NodeBatch —
    see GCNTask.template."""
    import copy

    import jax
    import jax.numpy as jnp
    from ..graph import grid_edge, build_graph
    from ..graph.graph import NodeBatch
    from ..models import GCNConfig, gcn_init
    from ..train import GCNTask, TrainConfig, fit

    fields = _load_darcy_fields(cfg, cfg.ntrain, cfg.data_path,
                                cfg.data_seed)
    arrays, norms = prepare_darcy(fields, n=cfg.ntrain, r=cfg.downsample,
                                  u_norm=cfg.u_norm)
    test_fields = _load_darcy_fields(cfg, cfg.ntest, cfg.test_data_path,
                                     cfg.data_seed + 1)
    test_arrays, _ = prepare_darcy(
        test_fields, n=cfg.ntest, r=cfg.downsample, normalizers=norms,
        u_normalizer=arrays.u_normalizer)
    test_arrays.u = np.asarray(arrays.u_normalizer.encode(test_arrays.u))
    s = arrays.s
    n = s * s

    # GCNConv ignores edge attributes — build the lattice once, unweighted
    X, ei, _ = grid_edge(s, s)
    # blocked-CSR aggregation for large grids (ops/segment.py
    # blocked_segment_mean — the s=421 lattice is 177k nodes, where the
    # XLA scatter serializes); small grids keep the flat one-hot path
    node_block = 512 if n >= 60000 else 0
    tpl = build_graph(np.zeros((n, 6), np.float32), ei[0], ei[1],
                      np.zeros((ei.shape[1], 1), np.float32),
                      node_block=node_block)
    n_pad = tpl.num_nodes_padded
    tpl = jax.device_put(tpl)

    def stack(arr, count):
        xs = np.zeros((count, n_pad, 6), np.float32)
        ys = np.zeros((count, n_pad, 1), np.float32)
        for j in range(count):
            xs[j, :n] = np.concatenate([
                X, arr.a[j][:, None], arr.a_smooth[j][:, None],
                arr.a_gradx[j][:, None], arr.a_grady[j][:, None]], axis=1)
            ys[j, :n, 0] = arr.u[j]
        return NodeBatch(x=xs, y=ys,
                         n_node=np.full((count,), n, np.int32))

    train_b = stack(arrays, cfg.ntrain)
    test_b = stack(test_arrays, cfg.ntest)

    # decode() runs on padded [B, N_pad] fields: extend the fitted
    # normalizer's per-node stats into the padding (mask zeroes those
    # nodes out of the loss/metric anyway)
    u_norm_pad = copy.copy(arrays.u_normalizer)
    pad = n_pad - n
    if pad:
        u_norm_pad.mean = jnp.concatenate(
            [jnp.asarray(u_norm_pad.mean), jnp.zeros((pad,))])
        u_norm_pad.std = jnp.concatenate(
            [jnp.asarray(u_norm_pad.std), jnp.ones((pad,))])

    mcfg = GCNConfig(width=cfg.width, ker_width=cfg.ker_width,
                     depth=cfg.depth, in_width=6)
    params = gcn_init(jax.random.PRNGKey(cfg.seed), mcfg)
    task = GCNTask(mcfg, u_normalizer=u_norm_pad, loss_type=cfg.loss,
                   use_sample_idx=False, template=tpl)
    tc = TrainConfig(epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate,
                     weight_decay=cfg.weight_decay,
                     scheduler_step=cfg.scheduler_step,
                     scheduler_gamma=cfg.scheduler_gamma, loss=cfg.loss,
                     seed=cfg.seed, epochs_per_jit=cfg.epochs_per_jit)
    res = fit(task, params, train_b, tc, test_data=test_b,
              callback=progress)
    return {"config": cfg.name, "train_l2": res.train_l2,
            "test_l2": res.test_l2, "test_epochs": res.test_epochs,
            "final_test_l2": res.test_l2[-1] if res.test_l2 else None,
            "epoch_times": res.epoch_times, "params": res.params,
            "extra": {"family": "gcn", "s": s,
                      "node_block": node_block}}


# ---------------------------------------------------------------- MGKN

def _run_mgkn_general(cfg: ExperimentConfig, progress=None,
                      figures_dir=None) -> Dict:
    import jax
    from ..models import MGKNGeneralConfig, mgkn_general_init
    from ..train import MGKNGeneralTask, TrainConfig, fit, evaluate

    fields = _load_darcy_fields(cfg, cfg.ntrain, cfg.data_path,
                                cfg.data_seed)
    arrays, norms = prepare_darcy(fields, n=cfg.ntrain, r=cfg.downsample,
                                  u_norm=cfg.u_norm)
    train_g, caps = darcy_mgkn_graphs(
        arrays, points=cfg.points, radius_inner=cfg.radius_inner,
        radius_inter=cfg.radius_inter, k=cfg.graphs_per_sample,
        seed=cfg.seed)
    test_fields = _load_darcy_fields(cfg, cfg.ntest, cfg.test_data_path,
                                     cfg.data_seed + 1)
    test_arrays, _ = prepare_darcy(
        test_fields, n=cfg.ntest, r=cfg.downsample, normalizers=norms,
        u_normalizer=arrays.u_normalizer)
    test_arrays.u = np.asarray(arrays.u_normalizer.encode(test_arrays.u))
    test_g, _ = darcy_mgkn_graphs(
        test_arrays, points=cfg.points, radius_inner=cfg.radius_inner,
        radius_inter=cfg.radius_inter, seed=cfg.seed + 1, caps=caps)

    mcfg = MGKNGeneralConfig(
        width=cfg.width, ker_width=cfg.ker_width, depth=cfg.depth,
        ker_in=6, in_width=6, points=tuple(cfg.points),
        variant=cfg.mgkn_variant, impl=cfg.impl,
        compute_dtype=cfg.compute_dtype, k_storage=cfg.k_storage)
    params = mgkn_general_init(jax.random.PRNGKey(cfg.seed), mcfg)
    task = MGKNGeneralTask(mcfg, u_normalizer=arrays.u_normalizer,
                           loss_type=cfg.loss)
    tc = TrainConfig(epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate,
                     weight_decay=cfg.weight_decay,
                     scheduler_step=cfg.scheduler_step,
                     scheduler_gamma=cfg.scheduler_gamma, loss=cfg.loss,
                     seed=cfg.seed, epochs_per_jit=cfg.epochs_per_jit)
    res = fit(task, params, train_g, tc, test_data=test_g,
              callback=progress)
    result = {"config": cfg.name, "train_l2": res.train_l2,
              "test_l2": res.test_l2, "test_epochs": res.test_epochs,
              "epoch_times": res.epoch_times,
              "final_test_l2": res.test_l2[-1] if res.test_l2 else None,
              "params": res.params,
              "_bundle": {"model_cfg": mcfg,
                          "normalizers": {**norms,
                                          "u": arrays.u_normalizer},
                          "extra": {"family": "mgkn_general",
                                    "experiment": cfg.name,
                                    "dataset": cfg.dataset,
                                    "radius_inner": list(cfg.radius_inner),
                                    "radius_inter": list(cfg.radius_inter),
                                    "train_s": int(arrays.s)}}}
    if cfg.eval_protocol == "split_random":
        result["full_field_l2"] = _eval_mgkn_split(
            cfg, mcfg, res.params, arrays, norms, caps)
    elif cfg.eval_protocol == "multires":
        result["multires"], result["multires_fresh_fields"] = \
            _eval_mgkn_multires(cfg, mcfg, task, res.params, arrays,
                                norms)
    if figures_dir:
        result["figures"] = _emit_run_figures(
            figures_dir, cfg, task, res.params, test_g, coords_dim=2)
    return result


def _eval_mgkn_multires(cfg, mcfg, task, params, arrays, norms):
    """MGKN zero-shot resolution generalization (neurips3_MGKN.py:357-387):
    the same weights on multilevel graphs sampled from finer grids (node
    counts per level stay fixed; the pool they are drawn from grows)."""
    from ..train import evaluate

    out = {}
    fresh = []
    for s_eval in cfg.eval_resolutions:
        derivable = (cfg.source_res >= s_eval
                     and (cfg.source_res - 1) % (s_eval - 1) == 0)
        if derivable:
            fields = _load_darcy_fields(cfg, cfg.ntest, cfg.test_data_path,
                                        cfg.data_seed + 2)
            r = (cfg.source_res - 1) // (s_eval - 1)
        else:
            # freshly generated test distribution, not the strided
            # protocol — flagged (see _eval_gkn_multires)
            import warnings

            warnings.warn(
                f"multires eval at s={s_eval}: source grid "
                f"{cfg.source_res} cannot derive it; using freshly "
                "generated fields (flagged in multires_fresh_fields)")
            fresh.append(int(s_eval))
            fields = load_or_generate_darcy(cfg.ntest, s_eval,
                                            seed=cfg.data_seed + 2)
            r = 1
        test_arrays, _ = prepare_darcy(
            fields, n=cfg.ntest, r=r, normalizers=norms,
            u_normalizer=arrays.u_normalizer)
        test_arrays.u = np.asarray(
            arrays.u_normalizer.encode(test_arrays.u))
        g, _ = darcy_mgkn_graphs(
            test_arrays, points=cfg.points, radius_inner=cfg.radius_inner,
            radius_inter=cfg.radius_inter, seed=cfg.seed + 3)
        out[int(test_arrays.s)] = evaluate(task, params, g,
                                           batch_size=cfg.batch_size)
    return out, fresh


def _eval_mgkn_split(cfg, mcfg, params, arrays, norms, caps):
    """Full-field MGKN eval via RandomMultiMeshSplitter
    (MGKN_general_darcy2d.py:306-332)."""
    import jax
    from ..graph import RandomMultiMeshSplitter
    from ..models import mgkn_general_apply
    from ..data import load_or_generate_darcy

    s = arrays.s
    n_eval = min(cfg.ntest, 5)
    # use the configured test .mat when present (the oracle A/B shares
    # test fields across the torch/jax sides); fresh fields otherwise
    fields = _load_darcy_fields(cfg, n_eval, cfg.test_data_path,
                                cfg.data_seed + 2)
    test_arrays, _ = prepare_darcy(fields, n=n_eval, r=cfg.downsample,
                                   normalizers=norms,
                                   u_normalizer=arrays.u_normalizer)
    sp = RandomMultiMeshSplitter([[0, 1], [0, 1]], [s, s],
                                 level=len(cfg.points),
                                 sample_sizes=list(cfg.points),
                                 seed=cfg.seed)
    fwd = jax.jit(lambda g: mgkn_general_apply(params, mcfg, g))
    lp = LpLoss(size_average=False)
    total = 0.0
    split_caps = None
    for j in range(n_eval):
        theta_all = np.stack([
            test_arrays.a[j], test_arrays.a_smooth[j],
            test_arrays.a_gradx[j], test_arrays.a_grady[j]], axis=1)
        graphs, split_caps = sp.splitter(
            list(cfg.radius_inner), list(cfg.radius_inter),
            test_arrays.a[j], theta_all, caps=split_caps)
        outs, idxs = [], []
        for g in graphs:
            out = np.asarray(fwd(g))[:, 0]
            idx = np.asarray(g.sample_idx)
            dec = arrays.u_normalizer.decode(out[None], sample_idx=idx[None])
            outs.append(np.asarray(dec)[0])
            idxs.append(idx)
        full = sp.assembler(outs, idxs)
        total += float(lp.rel(full[None], test_arrays.u[j][None]))
    return total / n_eval


def _run_torus_timeseries(cfg: ExperimentConfig, progress=None) -> Dict:
    """T-step training on the periodic domain — the grain-microstructure
    workflow behind the reference's shipped TorusGridSplitter checkpoints
    (mp/utilities.py:1321-1438 sampleT/assembleT; the driver script is
    not in the reference repo, SURVEY.md section 0). Protocol: per epoch
    each sample contributes one random periodic shard with T-step
    targets; eval stitches all deterministic shards with assembleT
    (wrap-mode Gaussian smoothing) and scores rel-L2 per step."""
    import jax
    import jax.numpy as jnp
    from ..graph import (TorusGridSplitter, make_box_grid, stack_graphs,
                         repad_edges)
    from ..models import GKNConfig, gkn_init, gkn_apply
    from ..train.optim import adam_steplr
    from ..utils import gaussian_filter

    res, T = cfg.source_res, cfg.torus_T
    rng = np.random.default_rng(cfg.data_seed)

    def make_sample():
        raw = rng.normal(size=(res, res)).astype(np.float32)
        theta = np.asarray(gaussian_filter(raw, sigma=2.0, mode="wrap"))
        theta = theta / max(float(theta.std()), 1e-6)  # O(1) amplitude
        y = np.stack([np.sin((t + 1) * theta) for t in range(T)])
        return theta.reshape(-1, 1), y.reshape(T, -1)

    train = [make_sample() for _ in range(cfg.ntrain)]
    test = [make_sample() for _ in range(cfg.ntest)]

    grid = make_box_grid([[0, 1], [0, 1]], [res, res]) * (res - 1) / res
    r = max(cfg.downsample, 1)
    m = (-(-res // r)) ** 2
    sp = TorusGridSplitter(grid, res, r=r, m=m, radius=cfg.radius_train,
                           T=T, seed=cfg.seed)

    mcfg = GKNConfig(width=cfg.width, ker_width=cfg.ker_width,
                     depth=cfg.depth, ker_in=5, in_width=3, out_width=T,
                     kernel_layers=_kernel_layers(cfg, 5),
                     relu_last=False, impl=cfg.impl,
                     compute_dtype=cfg.compute_dtype,
                     k_storage=cfg.k_storage)
    params = gkn_init(jax.random.PRNGKey(cfg.seed), mcfg)
    tx = adam_steplr(cfg.learning_rate, weight_decay=cfg.weight_decay,
                     steps_per_epoch=max(cfg.ntrain // cfg.batch_size, 1),
                     step_size_epochs=cfg.scheduler_step,
                     gamma=cfg.scheduler_gamma)
    opt = tx.init(params)

    @jax.jit
    def epoch_fn(params, opt, batches):
        def loss_fn(p, b):
            out = jax.vmap(lambda g: gkn_apply(p, mcfg, g))(b)
            mask = jax.vmap(lambda g: g.node_mask())(b)
            d = (out - b.y) * mask[..., None]
            return jnp.sum(d ** 2) / jnp.maximum(jnp.sum(mask) * T, 1.0)

        def body(carry, b):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn)(p, b)
            up, o = tx.update(g, o, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, up)
            return (p, o), loss

        (params, opt), losses = jax.lax.scan(body, (params, opt), batches)
        return params, opt, jnp.mean(losses)

    train_hist = []
    shuffle = np.random.default_rng(cfg.seed + 1)
    e_pad = 0  # monotone edge capacity: stable shapes, bounded recompiles
    for ep in range(cfg.epochs):
        # fresh random shard per sample per epoch (sampleT protocol)
        shards = [sp.sampleT(theta, y)[0] for theta, y in train]
        from ..graph import round_up

        e_pad = max(e_pad, round_up(
            max(g.senders.shape[0] for g in shards), 512))
        shards = [repad_edges(g, e_pad) for g in shards]
        order = shuffle.permutation(cfg.ntrain)
        n_steps = max(cfg.ntrain // cfg.batch_size, 1)
        sel = order[: n_steps * cfg.batch_size]
        batch = stack_graphs([shards[i] for i in sel])
        batches = jax.tree_util.tree_map(
            lambda a: a.reshape((n_steps, cfg.batch_size) + a.shape[1:]),
            batch)
        params, opt, loss = epoch_fn(params, opt, batches)
        train_hist.append(float(loss))
        if progress is not None:
            progress(ep, params, float(loss), None)

    # full-field eval: deterministic shards -> assembleT stitching
    fwd = jax.jit(lambda g: gkn_apply(params, mcfg, g))
    lp = LpLoss(size_average=False)
    totals = np.zeros(T)
    for theta, y in test:
        graphs = sp.get_data(theta)
        preds, xys = [], []
        for g, xy in graphs:
            out = np.asarray(fwd(g))[: int(g.n_node)]
            preds.append(out)
            xys.append(xy)
        full = sp.assembleT(preds, xys,
                            sigma=cfg.assemble_sigma)  # [T, n]
        for t in range(T):
            totals[t] += float(lp.rel(full[t][None],
                                      np.asarray(y[t])[None]))
    per_step = (totals / max(cfg.ntest, 1)).tolist()
    return {"config": cfg.name, "train_l2": train_hist,
            "test_l2_per_step": per_step,
            "final_test_l2": float(np.mean(per_step)), "params": params}


def _run_mgkn_orthogonal(cfg: ExperimentConfig, progress=None,
                         figures_dir=None) -> Dict:
    import jax
    import jax.numpy as jnp
    from ..models import (
        MultipoleGraph1D, MGKNOrthogonalConfig, mgkn_orthogonal_init,
    )
    from ..train import MGKNOrthogonalTask, TrainConfig, fit

    bfields = _load_burgers_fields(cfg, cfg.ntrain + cfg.ntest,
                                   cfg.data_path, cfg.data_seed)
    arrays = prepare_burgers(bfields, n=cfg.ntrain, r=cfg.downsample)
    test_arrays = prepare_burgers(
        {k: v[cfg.ntrain:] for k, v in bfields.items()}, n=cfg.ntest,
        r=cfg.downsample, a_normalizer=arrays.a_normalizer,
        u_normalizer=arrays.u_normalizer)

    def build(arr):
        xs, ys, senders, receivers, attrs = burgers_multipole_data(arr)
        return MultipoleGraph1D(
            x=jnp.asarray(xs),
            senders=[jnp.asarray(np.broadcast_to(s, (xs.shape[0],) + s.shape))
                     for s in senders],
            receivers=[jnp.asarray(np.broadcast_to(r, (xs.shape[0],) + r.shape))
                       for r in receivers],
            attrs=[jnp.asarray(a) for a in attrs],
            y=jnp.asarray(ys))

    train_g = build(arrays)
    test_g = build(test_arrays)

    mcfg = MGKNOrthogonalConfig(width=cfg.width, ker_width=cfg.ker_width,
                                depth=cfg.depth, ker_in=4, in_width=2,
                                s=arrays.s, impl=cfg.impl,
                                compute_dtype=cfg.compute_dtype,
                                k_storage=cfg.k_storage)
    params = mgkn_orthogonal_init(jax.random.PRNGKey(cfg.seed), mcfg)
    task = MGKNOrthogonalTask(mcfg, u_normalizer=arrays.u_normalizer,
                              loss_type=cfg.loss)
    tc = TrainConfig(epochs=cfg.epochs, batch_size=cfg.batch_size,
                     learning_rate=cfg.learning_rate,
                     weight_decay=cfg.weight_decay,
                     scheduler_step=cfg.scheduler_step,
                     scheduler_gamma=cfg.scheduler_gamma, loss=cfg.loss,
                     seed=cfg.seed, epochs_per_jit=cfg.epochs_per_jit)
    res = fit(task, params, train_g, tc, test_data=test_g,
              callback=progress)
    figures = (_emit_run_figures(figures_dir, cfg, task, res.params,
                                 test_g, coords_dim=1)
               if figures_dir else None)
    return {"config": cfg.name, "train_l2": res.train_l2,
            "test_l2": res.test_l2, "test_epochs": res.test_epochs,
            "epoch_times": res.epoch_times,
            "final_test_l2": res.test_l2[-1] if res.test_l2 else None,
            "figures": figures,
            "params": res.params,
            "_bundle": {"model_cfg": mcfg,
                        "normalizers": {"a": arrays.a_normalizer,
                                        "u": arrays.u_normalizer},
                        "extra": {"family": "mgkn_orthogonal",
                                  "experiment": cfg.name,
                                  "dataset": cfg.dataset,
                                  "train_s": int(arrays.s)}}}


__all__ = ["run_experiment"]
