"""Summarizes the oracle convergence A/B (docs/ORACLE.md): reads the
per-seed torch/jax result JSONs from results/oracle/ and prints the
comparison table with across-seed spread.

Verdict rule: |mean_jax - mean_torch| <= max spread of either side
(the two implementations cannot share RNG streams, so agreement within
seed noise is the strongest available statement).

Usage: python -m oracle.compare [--dir results/oracle]
"""
from __future__ import annotations

import argparse
import glob
import json

import numpy as np


def collect(dirname, protocol, side):
    out = []
    for path in sorted(glob.glob(f"{dirname}/{protocol}_{side}_s*.json")):
        with open(path) as f:
            out.append(json.load(f))
    return out


def spread(vals):
    return max(vals) - min(vals) if len(vals) > 1 else 0.0


def summarize(dirname, protocol, metrics):
    rows = []
    sides = {s: collect(dirname, protocol, s) for s in ("torch", "jax")}
    for label, getter in metrics:
        vals = {}
        for side, runs in sides.items():
            v = [getter(r) for r in runs]
            v = [x for x in v if x is not None]
            vals[side] = v
        if not vals["torch"] or not vals["jax"]:
            continue
        mt, mj = np.mean(vals["torch"]), np.mean(vals["jax"])
        sp = max(spread(vals["torch"]), spread(vals["jax"]))
        ok = abs(mj - mt) <= max(sp, 1e-12)
        rows.append((label, mt, spread(vals["torch"]), mj,
                     spread(vals["jax"]), abs(mj - mt), ok,
                     len(vals["torch"]), len(vals["jax"])))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="results/oracle")
    args = ap.parse_args()

    protos = {
        "uai3": [
            ("final train rel-L2", lambda r: r.get("final_train_l2")),
            ("zero-shot s=61",
             lambda r: (r.get("multires") or {}).get("61")),
            ("zero-shot s=121",
             lambda r: (r.get("multires") or {}).get("121")),
            ("zero-shot s=241",
             lambda r: (r.get("multires") or {}).get("241")),
        ],
        "mgkn": [
            ("final train rel-L2", lambda r: r.get("final_train_l2")),
            ("final test rel-L2", lambda r: r.get("final_test_l2")),
        ],
        "mgkn_general": [
            ("final train rel-L2", lambda r: r.get("final_train_l2")),
            ("final test rel-L2", lambda r: r.get("final_test_l2")),
        ],
    }
    all_ok = True
    for proto, metrics in protos.items():
        rows = summarize(args.dir, proto, metrics)
        if not rows:
            print(f"{proto}: no results yet")
            continue
        print(f"\n== {proto} (torch n={rows[0][7]}, jax n={rows[0][8]})")
        print(f"{'metric':24} {'torch':>8} {'±sprd':>7} {'jax':>8} "
              f"{'±sprd':>7} {'|Δ|':>7}  verdict")
        for (label, mt, st, mj, sj, d, ok, *_ ) in rows:
            all_ok &= ok
            print(f"{label:24} {mt:8.4f} {st:7.4f} {mj:8.4f} "
                  f"{sj:7.4f} {d:7.4f}  "
                  f"{'WITHIN-SPREAD' if ok else 'DIVERGES'}")
    print("\nA/B:", "PASS (all metrics within across-seed spread)"
          if all_ok else "CHECK divergent rows")


if __name__ == "__main__":
    main()
