"""Sharding specifications for data and tensor parallelism.

GSPMD style: we annotate parameter and batch shardings; XLA inserts the
collectives (all-reduce for DP gradients, all-gather/reduce-scatter around
the TP kernel-MLP GEMMs) over ICI.

TP scheme for the edge-kernel MLP (the dominant FLOPs): Megatron-style
alternating column/row parallelism —
  layer 0 (and even layers): weight sharded on the OUTPUT dim (column
    parallel; activations become hidden-sharded),
  odd layers: weight sharded on the INPUT dim (row parallel; XLA inserts
    the all-reduce on the partial sums).
The final layer's [ker_width, w_in*w_out] GEMM is by far the largest; with
an even number of hidden layers it lands row-parallel, so the [E, w^2]
intermediate is never fully replicated.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spec() -> P:
    return P("data")


def batch_sharding(mesh: Mesh, pytree: Any):
    """Leading-axis 'data' sharding for every array in a stacked batch."""
    def spec_for(leaf):
        return NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))
    return jax.tree_util.tree_map(spec_for, pytree)


def _dense_layer_specs(n_layers: int, tp_axis: str):
    """Alternating column/row parallel specs for a DenseNet."""
    specs = []
    for j in range(n_layers):
        if j % 2 == 0:  # column parallel: shard output dim (+ bias)
            specs.append({"w": P(None, tp_axis), "b": P(tp_axis)})
        else:           # row parallel: shard input dim; bias replicated
            specs.append({"w": P(tp_axis, None), "b": P(None)})
    return tuple(specs)


def param_specs(params: Any, tp_axis: str = "model") -> Any:
    """PartitionSpecs for a model param pytree: kernel MLPs TP-sharded,
    everything else replicated.

    Works on the param structures of graph_pde_tpu.models.* — any dict key
    named 'kernel' holding a DenseNet tuple gets the alternating scheme.
    """
    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "kernel" and isinstance(v, (tuple, list)):
                    out[k] = _dense_layer_specs(len(v), tp_axis)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (tuple, list)):
            t = type(node)
            return t(walk(v) for v in node)
        # leaf array -> replicated
        return P()
    return walk(params)


def param_sharding(mesh: Mesh, params: Any, tp_axis: str = "model"):
    specs = param_specs(params, tp_axis)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def replicated_sharding(mesh: Mesh, pytree: Any):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), pytree)


__all__ = [
    "batch_spec", "batch_sharding", "param_specs", "param_sharding",
    "replicated_sharding",
]
