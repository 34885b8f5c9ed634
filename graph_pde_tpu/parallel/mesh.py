"""Device mesh construction.

The reference is single-process single-GPU (SURVEY.md section 2.6); every
parallel axis here is new capability. Axes:

- 'data': graph samples (data parallel; gradients psum over ICI).
- 'model': tensor parallel over the kernel-MLP hidden/output dims.

Node/edge sharding for single-graph scale-out lives in parallel/halo.py
and uses its own 1-d mesh axis.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Builds a Mesh over the available devices.

    axis_sizes=None puts all devices on the first axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, (
        f"mesh {axis_sizes} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def default_mesh_shape(n_devices: int, tp: int = 1) -> Tuple[int, int]:
    """(data, model) split: tp-way tensor parallel, rest data parallel."""
    assert n_devices % tp == 0
    return (n_devices // tp, tp)


__all__ = ["make_mesh", "default_mesh_shape"]
