"""Metrics logging and visualization.

Upgrades the reference's print + np.savetxt observability
(UAI1_full_resolution.py:283,312-315; SURVEY.md section 5): structured
JSONL metric streams, reference-compatible .txt error curves, optional
jax.profiler trace capture, and the truth/approx/error triptych figures
the reference saves per run (UAI1:335-461).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    """Per-epoch metric stream: stdout line + JSONL file + in-memory
    history; `save_txt` emits the reference's np.savetxt layout."""

    def __init__(self, out_dir: Optional[str] = None,
                 name: str = "run", echo: bool = True):
        self.out_dir = out_dir
        self.name = name
        self.echo = echo
        self.history: list = []
        self._t0 = time.perf_counter()
        self._file = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._file = open(os.path.join(out_dir, f"{name}.jsonl"), "a")

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "time": time.perf_counter() - self._t0}
        rec.update({k: (float(v) if v is not None else None)
                    for k, v in metrics.items()})
        self.history.append(rec)
        if self.echo:
            msg = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else
                           f"{k}={v}" for k, v in rec.items())
            print(msg, flush=True)
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()

    def save_txt(self, key: str, path: Optional[str] = None) -> np.ndarray:
        """Reference-style error-curve file (np.savetxt of the per-epoch
        array, UAI1_full_resolution.py:312-315)."""
        arr = np.asarray([r.get(key, np.nan) for r in self.history])
        if path is None and self.out_dir:
            path = os.path.join(self.out_dir, f"{self.name}_{key}.txt")
        if path:
            np.savetxt(path, arr)
        return arr

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None


def profile_trace(log_dir: str):
    """Context manager capturing a jax.profiler trace (replaces the
    reference's wall-clock-only bracketing, SURVEY.md section 5)."""
    import jax

    return jax.profiler.trace(log_dir)


def save_field_triptych(truth: np.ndarray, approx: np.ndarray,
                        path: str, title: str = "") -> Optional[str]:
    """Truth / prediction / error triptych on a square grid
    (UAI1_full_resolution.py:335-461). Returns the written path, or None
    if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    s = int(round(np.sqrt(truth.size)))
    t = np.asarray(truth).reshape(s, s)
    a = np.asarray(approx).reshape(s, s)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, name) in zip(axes, [(t, "truth"), (a, "approx"),
                                      (t - a, "error")]):
        im = ax.imshow(img)
        ax.set_title(name)
        fig.colorbar(im, ax=ax, fraction=0.046)
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def save_points_triptych(xy: np.ndarray, truth: np.ndarray,
                         approx: np.ndarray, path: str,
                         title: str = "") -> Optional[str]:
    """Truth / prediction / error triptych for scattered (Nystrom) nodes
    — the reference's per-run visual inspection (UAI1:335-461) adapted
    to subsampled graphs where no full grid exists."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    t, a = np.asarray(truth), np.asarray(approx)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (vals, name) in zip(axes, [(t, "truth"), (a, "approx"),
                                       (t - a, "error")]):
        im = ax.scatter(xy[:, 0], xy[:, 1], c=vals, s=14)
        ax.set_title(name)
        ax.set_aspect("equal")
        fig.colorbar(im, ax=ax, fraction=0.046)
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def save_line_triptych(x: np.ndarray, truth: np.ndarray,
                       approx: np.ndarray, path: str,
                       title: str = "") -> Optional[str]:
    """1-D variant (Burgers): truth vs prediction overlay + error."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    t, a = np.asarray(truth), np.asarray(approx)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(x, t, label="truth")
    axes[0].plot(x, a, "--", label="approx")
    axes[0].legend()
    axes[0].set_title("truth vs approx")
    axes[1].plot(x, t - a)
    axes[1].set_title("error")
    if title:
        fig.suptitle(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


__all__ = ["MetricsLogger", "profile_trace", "save_field_triptych",
           "save_points_triptych", "save_line_triptych"]
