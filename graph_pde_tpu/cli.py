"""Command-line interface.

Usage:
    python -m graph_pde_tpu.cli list
    python -m graph_pde_tpu.cli run <experiment> [--smoke] [--epochs N]
        [--set key=value ...] [--out results.json]

Replaces the reference's "each script shall be stand-alone and directly
runnable" model (README.md:18) with one entry point over the registry.
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
    args = p.parse_args(argv)

    if args.cmd == "list":
        for n in names():
            print(n)
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
    result = run_experiment(cfg, smoke=args.smoke, progress=progress)
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
