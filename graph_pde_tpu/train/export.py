"""Model bundle export/load.

The reference persists whole-model pickles (torch.save(model, path),
UAI1_full_resolution.py:317) that are tied to its class definitions. Here
a *bundle* is a portable artifact: param pytree (orbax), model config
(dataclass -> json), and normalizer statistics — everything
graph_pde_tpu.inference needs to serve a trained operator.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..utils.normalizers import (UnitGaussianNormalizer, GaussianNormalizer,
                                 RangeNormalizer)

_MODEL_CONFIGS = {}


def _config_registry():
    if not _MODEL_CONFIGS:
        from ..models import (GKNConfig, MGKNGeneralConfig,
                              MGKNOrthogonalConfig, GCNConfig)

        _MODEL_CONFIGS.update({
            "GKNConfig": GKNConfig,
            "MGKNGeneralConfig": MGKNGeneralConfig,
            "MGKNOrthogonalConfig": MGKNOrthogonalConfig,
            "GCNConfig": GCNConfig,
        })
    return _MODEL_CONFIGS


def _normalizer_state(norm) -> Dict[str, Any]:
    if isinstance(norm, UnitGaussianNormalizer):
        return {"kind": "unit", "mean": np.asarray(norm.mean).tolist(),
                "std": np.asarray(norm.std).tolist(), "eps": norm.eps}
    if isinstance(norm, GaussianNormalizer):
        return {"kind": "gaussian", "mean": float(norm.mean),
                "std": float(norm.std), "eps": norm.eps}
    if isinstance(norm, RangeNormalizer):
        return {"kind": "range", "a": np.asarray(norm.a).tolist(),
                "b": np.asarray(norm.b).tolist()}
    raise TypeError(type(norm))


def _normalizer_from_state(state) -> Any:
    kind = state["kind"]
    if kind == "unit":
        n = UnitGaussianNormalizer.__new__(UnitGaussianNormalizer)
        import jax.numpy as jnp

        n.mean = jnp.asarray(np.asarray(state["mean"], np.float32))
        n.std = jnp.asarray(np.asarray(state["std"], np.float32))
        n.eps = state["eps"]
        return n
    if kind == "gaussian":
        n = GaussianNormalizer.__new__(GaussianNormalizer)
        import jax.numpy as jnp

        n.mean = jnp.asarray(np.float32(state["mean"]))
        n.std = jnp.asarray(np.float32(state["std"]))
        n.eps = state["eps"]
        return n
    if kind == "range":
        n = RangeNormalizer.__new__(RangeNormalizer)
        import jax.numpy as jnp

        n.a = jnp.asarray(np.asarray(state["a"], np.float32))
        n.b = jnp.asarray(np.asarray(state["b"], np.float32))
        return n
    raise ValueError(kind)


def save_bundle(directory: str, params, model_cfg,
                normalizers: Optional[Dict[str, Any]] = None,
                extra: Optional[Dict[str, Any]] = None) -> str:
    """Writes a serving bundle: {params/ (orbax), bundle.json}."""
    from .checkpoint import save_checkpoint

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    save_checkpoint(os.path.join(directory, "params"), 0, params)
    meta = {
        "model_config_class": type(model_cfg).__name__,
        "model_config": dataclasses.asdict(model_cfg),
        "normalizers": {k: _normalizer_state(v)
                        for k, v in (normalizers or {}).items()},
        "extra": extra or {},
    }
    with open(os.path.join(directory, "bundle.json"), "w") as f:
        json.dump(meta, f)
    return directory


def load_bundle(directory: str):
    """Returns (params, model_cfg, normalizers, extra)."""
    from .checkpoint import restore_checkpoint

    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "bundle.json")) as f:
        meta = json.load(f)
    cls = _config_registry()[meta["model_config_class"]]
    cfg_dict = dict(meta["model_config"])
    for k, v in list(cfg_dict.items()):
        if isinstance(v, list):
            cfg_dict[k] = tuple(v)
    cfg = cls(**cfg_dict)
    restored = restore_checkpoint(os.path.join(directory, "params"))
    params = restored["params"]
    norms = {k: _normalizer_from_state(v)
             for k, v in meta["normalizers"].items()}
    return params, cfg, norms, meta.get("extra", {})


__all__ = ["save_bundle", "load_bundle"]
