"""Checkpoint/resume via orbax.

Upgrade over the reference's end-of-training whole-model pickle
(torch.save(model, path), UAI1_full_resolution.py:317): we checkpoint
params + optimizer state + step with atomic versioned saves and restore
for mid-training resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(directory: str, step: int, params: Any,
                    opt_state: Any = None, keep: int = 3) -> str:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    ckpt = {"params": params}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    _prune(directory, keep)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(directory)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Optional[dict]:
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            restored = ckptr.restore(path, item=template)
        else:
            restored = ckptr.restore(path)
    restored["step"] = step
    return restored


def _prune(directory: str, keep: int) -> None:
    steps = sorted(int(d.split("_", 1)[1]) for d in os.listdir(directory)
                   if d.startswith("step_"))
    import shutil

    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(directory, f"step_{s}"),
                      ignore_errors=True)


__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]
