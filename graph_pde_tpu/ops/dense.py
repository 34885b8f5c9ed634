"""Kernel MLPs (the edge-kernel network kappa_theta).

Functional re-design of the reference ``DenseNet`` / ``DenseNet_sin``
(multipole-graph-neural-operator/utilities.py:205-252): parameters are a
plain pytree (tuple of {'w','b'} dicts) and ``apply`` is a pure function,
so the same MLP runs inside jit, vmap, pallas-adjacent code, and pjit with
sharding annotations on the weights.

Initialization matches torch.nn.Linear defaults for statistical parity:
W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)). Weights are stored [in, out].
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def pyg_uniform_init(key, size: int, shape, dtype=jnp.float32):
    """PyG's `uniform(size, tensor)` init: U(+-1/sqrt(size))
    (graph-neural-operator/nn_conv.py:261-265)."""
    bound = 1.0 / np.sqrt(size)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def dense_init(key, layers: Sequence[int], dtype=jnp.float32) -> Tuple:
    """Init a DenseNet with the given layer widths (len >= 2)."""
    assert len(layers) >= 2
    keys = jax.random.split(key, len(layers) - 1)
    return tuple(
        linear_init(keys[j], layers[j], layers[j + 1], dtype)
        for j in range(len(layers) - 1)
    )


def dense_apply(params, x, nonlinearity: Callable = jax.nn.relu,
                out_nonlinearity: Callable | None = None):
    """DenseNet forward: Linear stack with `nonlinearity` between layers
    and optional output nonlinearity (utilities.py:205-231).

    BatchNorm (`normalize=True`) is intentionally unsupported: no in-repo
    reference script uses it, and per-edge batch statistics are hostile to
    static-shape padded batches.
    """
    n = len(params)
    for j, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if j != n - 1:
            x = nonlinearity(x)
    if out_nonlinearity is not None:
        x = out_nonlinearity(x)
    return x


def dense_sin_apply(params, x):
    """DenseNet_sin forward: sin activations (utilities.py:233-252)."""
    return dense_apply(params, x, nonlinearity=jnp.sin)


__all__ = [
    "linear_init",
    "pyg_uniform_init",
    "dense_init",
    "dense_apply",
    "dense_sin_apply",
]
