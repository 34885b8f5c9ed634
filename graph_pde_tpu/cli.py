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


def main(argv=None):
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
