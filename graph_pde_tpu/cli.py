"""Command-line interface.

Usage:
    python -m graph_pde_tpu.cli list
    python -m graph_pde_tpu.cli run <experiment> [--smoke]
        [--set key=value ...] [--out results.json] [--bundle DIR]
    python -m graph_pde_tpu.cli sweep <experiment> [--smoke]
        [--axis key=[v1,v2,...]] [--out results.json]
    python -m graph_pde_tpu.cli predict <bundle_dir>
        (--input fields.mat | --synthetic N --res S)
        [--output pred.mat] [--truth-field sol]

Replaces the reference's "each script shall be stand-alone and directly
runnable" model (README.md:18) with one entry point over the registry,
plus a serving path the reference does not have: `run --bundle` exports
a portable artifact (params + model config + normalizer stats,
train/export.py) and `predict` serves it on new coefficient fields at
any grid resolution (inference.GKNPredictor).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _parse_override(kv: str):
    key, val = kv.split("=", 1)
    try:
        parsed = json.loads(val)
    except json.JSONDecodeError:
        parsed = val
    if isinstance(parsed, list):
        parsed = tuple(parsed)
    return key, parsed


def _setup_jax_cache():
    """Persistent compilation cache: first compiles through the remote
    compile helper cost minutes (PERF_NOTES.md); cache them on disk."""
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _predict_darcy(args, params, mcfg, norms, extra):
    """Darcy serving (GKN at any resolution / general MGKN via the
    reference's split-assemble protocol, MGKN_general_darcy2d.py:306-333).
    Coefficient fields in, decoded solution fields out."""
    import numpy as np

    kcoeff = kx = ky = None
    truth = None
    if args.input:
        from .utils.matio import MatReader

        reader = MatReader(args.input)
        coeff = reader.read_field("coeff")
        for name, slot in (("Kcoeff", "kcoeff"), ("Kcoeff_x", "kx"),
                           ("Kcoeff_y", "ky")):
            try:
                val = reader.read_field(name)
            except KeyError:
                continue
            if slot == "kcoeff":
                kcoeff = val
            elif slot == "kx":
                kx = val
            else:
                ky = val
        if args.truth_field:
            truth = reader.read_field(args.truth_field)
    else:
        from .data import load_or_generate_darcy

        fields = load_or_generate_darcy(args.synthetic, args.res)
        coeff, kcoeff = fields["coeff"], fields["Kcoeff"]
        kx, ky = fields["Kcoeff_x"], fields["Kcoeff_y"]
        truth = fields["sol"]

    if args.n:
        def cut(a):
            return None if a is None else a[: args.n]

        coeff, kcoeff, kx, ky = map(cut, (coeff, kcoeff, kx, ky))
        truth = cut(truth)

    input_norms = {k: norms[k] for k in
                   ("a", "a_smooth", "a_gradx", "a_grady")}
    if extra.get("family") == "mgkn_general":
        from .inference import MGKNGeneralPredictor

        predictor = MGKNGeneralPredictor(
            params, mcfg, input_normalizers=input_norms,
            u_normalizer=norms["u"],
            radius_inner=tuple(extra["radius_inner"]),
            radius_inter=tuple(extra["radius_inter"]))
    else:
        from .inference import GKNPredictor

        predictor = GKNPredictor(
            params, mcfg, input_normalizers=input_norms,
            u_normalizer=norms["u"],
            radius=float(extra.get("radius", 0.2)))
    t0 = time.perf_counter()
    pred = predictor.predict(coeff, kcoeff, kx, ky)
    dt = time.perf_counter() - t0
    n, s = coeff.shape[0], coeff.shape[1]
    summary = {"n": n, "s": s, "wall_time_s": round(dt, 3),
               "per_sample_ms": round(1000 * dt / n, 2)}
    if truth is not None:
        from .utils.losses import LpLoss

        rel = LpLoss(size_average=True).rel(
            pred.reshape(n, -1), np.asarray(truth).reshape(n, -1))
        summary["rel_l2"] = round(float(rel), 6)
    if args.output:
        from .utils.matio import write_mat

        write_mat(args.output, {"pred": pred.reshape(n, s, s)})
        summary["output"] = args.output
    print(json.dumps(summary))
    return 0


def _predict_burgers_orthogonal(args, params, mcfg, norms, extra):
    """Orthogonal-MGKN serving: Burgers initial conditions 'a' [n, s] in
    (at the bundle's training s — the level hierarchy is baked into the
    weights), decoded solutions out."""
    import numpy as np

    from .inference import MGKNOrthogonalPredictor

    truth = None
    if args.input:
        from .utils.matio import MatReader

        reader = MatReader(args.input)
        a = reader.read_field("a")
        if args.truth_field:
            truth = reader.read_field(args.truth_field)
    else:
        from .data import load_or_generate_burgers

        fields = load_or_generate_burgers(args.synthetic, mcfg.s)
        a, truth = fields["a"], fields["u"]
    if args.n:
        a = a[: args.n]
        truth = None if truth is None else truth[: args.n]
    if a.shape[1] != mcfg.s and a.shape[1] % mcfg.s == 0:
        # stride-downsample to the training grid (the reference reads
        # 2^13 fields and strides by r, MGKN_orthogonal_burgers1d.py:137)
        a = a[:, :: a.shape[1] // mcfg.s]
        truth = None if truth is None else \
            truth[:, :: truth.shape[1] // mcfg.s]

    predictor = MGKNOrthogonalPredictor(
        params, mcfg, a_normalizer=norms["a"], u_normalizer=norms["u"])
    t0 = time.perf_counter()
    pred = predictor.predict(a)
    dt = time.perf_counter() - t0
    n, s = pred.shape
    summary = {"n": n, "s": s, "wall_time_s": round(dt, 3),
               "per_sample_ms": round(1000 * dt / n, 2)}
    if truth is not None:
        from .utils.losses import LpLoss

        rel = LpLoss(size_average=True).rel(pred,
                                            np.asarray(truth)[:, :s])
        summary["rel_l2"] = round(float(rel), 6)
    if args.output:
        from .utils.matio import write_mat

        write_mat(args.output, {"pred": pred})
        summary["output"] = args.output
    print(json.dumps(summary))
    return 0


def _predict(args):
    """Serve a trained bundle on new input fields. Dispatches on the
    bundle's family: GKN (Darcy, any resolution — discretization
    invariance), general MGKN (Darcy, reference split/assemble
    protocol), orthogonal MGKN (Burgers at the training s)."""
    from .train import load_bundle

    if not args.input and not args.synthetic:
        print("error: need --input or --synthetic", file=sys.stderr)
        return 2
    params, mcfg, norms, extra = load_bundle(args.bundle)
    family = extra.get("family", "gkn")
    dataset = extra.get("dataset", "darcy")
    if family == "mgkn_orthogonal":
        return _predict_burgers_orthogonal(args, params, mcfg, norms,
                                           extra)
    if dataset == "darcy" and family in ("gkn", "mgkn_general"):
        return _predict_darcy(args, params, mcfg, norms, extra)
    print(f"error: no serving path for family={family!r} "
          f"dataset={dataset!r}", file=sys.stderr)
    return 2


def main(argv=None):
    _setup_jax_cache()
    from .experiments import get, names, run_experiment

    p = argparse.ArgumentParser(prog="graph_pde_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered experiments")
    runp = sub.add_parser("run", help="run an experiment")
    runp.add_argument("experiment", help="experiment name")
    runp.add_argument("--smoke", action="store_true",
                      help="seconds-scale version for verification")
    runp.add_argument("--set", action="append", default=[],
                      metavar="key=value", help="config override")
    runp.add_argument("--out", default=None, help="write results JSON")
    runp.add_argument("--expect-l2", type=float, default=None,
                      help="parity assertion: fail (exit 1) unless the "
                           "chosen metric is within --tol of this value "
                           "(docs/PARITY.md workflow)")
    runp.add_argument("--metric", default="final_test_l2",
                      help="result key checked by --expect-l2 "
                           "(final_test_l2 | full_field_l2 | "
                           "multires:<s>)")
    runp.add_argument("--tol", type=float, default=1e-3,
                      help="tolerance for --expect-l2 (BASELINE.md "
                           "north star: rel-L2 parity +-1e-3)")
    runp.add_argument("--bundle", default=None, metavar="DIR",
                      help="export a serving bundle of the trained "
                           "model (train/export.py)")
    runp.add_argument("--figures", default=None, metavar="DIR",
                      help="save truth/approx/error triptychs for the "
                           "worst/median/best test samples (reference "
                           "parity: UAI1_full_resolution.py:335-461)")
    runp.add_argument("--profile", default=None, metavar="DIR",
                      help="capture a jax.profiler trace of the run")
    runp.add_argument("--curves", default=None, metavar="DIR",
                      help="save epoch-indexed train/test rel-L2 curve "
                           ".txt files (FitResult.save_curves)")
    swp = sub.add_parser("sweep", help="run a parameter sweep (the "
                                       "reference scripts' for-loops)")
    swp.add_argument("experiment", help="experiment name")
    swp.add_argument("--smoke", action="store_true")
    swp.add_argument("--axis", action="append", default=[],
                     metavar="key=[v1,v2,...]",
                     help="sweep axis as JSON list (default: the "
                          "reference's own sweep for this experiment)")
    swp.add_argument("--out", default=None, help="write results JSON")
    predp = sub.add_parser("predict", help="serve a trained bundle on "
                                           "new coefficient fields")
    predp.add_argument("bundle", help="bundle dir from run --bundle")
    predp.add_argument("--input", default=None,
                       help=".mat with 'coeff' [n, s, s] (+ optional "
                            "Kcoeff/Kcoeff_x/Kcoeff_y; derived if absent)")
    predp.add_argument("--synthetic", type=int, default=0, metavar="N",
                       help="generate N synthetic Darcy fields instead "
                            "of --input")
    predp.add_argument("--res", type=int, default=61,
                       help="grid resolution for --synthetic")
    predp.add_argument("--n", type=int, default=None,
                       help="predict only the first N samples")
    predp.add_argument("--output", default=None,
                       help="write predictions ('pred' [n, s, s]) "
                            "as .mat")
    predp.add_argument("--truth-field", default=None, metavar="NAME",
                       help="field with ground truth in --input "
                            "(e.g. 'sol'): prints mean rel-L2")
    args = p.parse_args(argv)

    if args.cmd == "list":
        for n in names():
            print(n)
        return 0
    if args.cmd == "predict":
        return _predict(args)
    if args.cmd == "sweep":
        from .experiments.sweeps import REFERENCE_SWEEPS, run_sweep

        axes = dict(_parse_override(kv) for kv in args.axis) or None
        if axes is None and args.experiment not in REFERENCE_SWEEPS:
            print(f"error: no reference sweep for {args.experiment!r}; "
                  "pass --axis key=[v1,v2,...]", file=sys.stderr)
            return 2
        axes = {k: tuple(v) if isinstance(v, (list, tuple)) else (v,)
                for k, v in axes.items()} if axes else None
        results = run_sweep(args.experiment, axes, smoke=args.smoke)
        for r in results:
            print(json.dumps({"swept": r["swept"],
                              "final_test_l2": r.get("final_test_l2"),
                              "full_field_l2": r.get("full_field_l2")},
                             default=str))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, default=str)
        return 0

    cfg = get(args.experiment)
    overrides = dict(_parse_override(kv) for kv in args.set)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    def progress(ep, params, train_l2, test_l2):
        msg = f"epoch {ep}: train_l2={train_l2:.5f}"
        if test_l2 is not None:
            msg += f" test_l2={test_l2:.5f}"
        print(msg, flush=True)

    t0 = time.perf_counter()
    result = run_experiment(cfg, smoke=args.smoke, progress=progress,
                            figures_dir=args.figures,
                            profile_dir=args.profile)
    bundle_payload = result.pop("_bundle", None)
    if args.curves:
        import numpy as _np
        import os as _os

        _os.makedirs(args.curves, exist_ok=True)
        train = _np.stack([
            _np.arange(1, len(result["train_l2"]) + 1, dtype=float),
            _np.asarray(result["train_l2"], float)], axis=1)
        _np.savetxt(_os.path.join(args.curves,
                                  f"{cfg.name}_train_l2.txt"),
                    train, header="epoch rel_l2")
        if result.get("test_l2"):
            test = _np.stack([
                _np.asarray(result.get("test_epochs") or
                            range(1, len(result["test_l2"]) + 1), float),
                _np.asarray(result["test_l2"], float)], axis=1)
            _np.savetxt(_os.path.join(args.curves,
                                      f"{cfg.name}_test_l2.txt"),
                        test, header="epoch rel_l2")
        print(f"curves -> {args.curves}")
    if args.bundle:
        if bundle_payload is None:
            print(f"error: {cfg.family!r} runner exports no bundle",
                  file=sys.stderr)
            return 2
        from .train import save_bundle

        save_bundle(args.bundle, result["params"],
                    bundle_payload["model_cfg"],
                    normalizers=bundle_payload["normalizers"],
                    extra=bundle_payload["extra"])
        print(f"bundle -> {args.bundle}")
    result.pop("params", None)
    result["wall_time_s"] = time.perf_counter() - t0
    print(json.dumps({k: v for k, v in result.items()
                      if not isinstance(v, (list, dict))
                      or k in ("multires",)}, default=str))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, default=str)
    if args.expect_l2 is not None:
        try:
            if args.metric.startswith("multires:"):
                value = result["multires"][
                    int(args.metric.split(":", 1)[1])]
            else:
                value = result[args.metric]
        except KeyError:
            have = sorted(k for k, v in result.items()
                          if isinstance(v, (int, float)) or k == "multires")
            print(f"error: --metric {args.metric!r} not in results; "
                  f"available: {have}", file=sys.stderr)
            return 2
        if value is None:
            print(f"error: --metric {args.metric!r} is None for this "
                  "config (no test data / eval protocol?)",
                  file=sys.stderr)
            return 2
        dev = abs(float(value) - args.expect_l2)
        ok = dev <= args.tol
        print(f"parity {args.metric}={float(value):.6f} "
              f"expected={args.expect_l2:.6f} |dev|={dev:.2e} "
              f"tol={args.tol:.0e} -> {'PASS' if ok else 'FAIL'}")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
