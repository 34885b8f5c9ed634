"""Import reference (PyTorch) checkpoints.

The reference persists whole-model pickles (torch.save(model, path),
UAI1_full_resolution.py:317) and ships two trained KernelNN checkpoints
(graph-neural-operator/model/grain_*). Those pickles reference classes
defined in the training script's __main__ (KernelNN, NNConv_old,
DenseNet), which we must NOT import or replicate — instead a stub
unpickler materializes placeholder classes and we walk the resulting
module tree's _parameters/_modules dicts to extract tensors.

`convert_kernelnn` maps the tree onto this framework's GKN param layout:
torch Linear stores weight [out, in] (we store [in, out] -> transpose);
NNConv_old's root is [in_channels, out_channels] applied as x @ root
(nn_conv.py:279) — same orientation as ours, no transpose.
"""
from __future__ import annotations

import pickle
import types
from typing import Any, Tuple

import numpy as np


class _Stub:
    pass


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            return type(name, (_Stub,), {"__module__": module})


def load_torch_module(path: str) -> Any:
    """Unpickles a torch full-model checkpoint into a stub object tree
    (no reference code imported/executed)."""
    import torch

    fake = types.ModuleType("gpde_stub_pickle")
    fake.Unpickler = _StubUnpickler
    fake.load = pickle.load
    fake.loads = pickle.loads
    return torch.load(path, map_location="cpu", pickle_module=fake,
                      weights_only=False)


def _params_of(mod) -> dict:
    return {k: (None if v is None else np.asarray(v.detach().numpy()))
            for k, v in mod.__dict__.get("_parameters", {}).items()}


def _modules_of(mod) -> dict:
    return mod.__dict__.get("_modules", {})


def _linear(mod) -> dict:
    p = _params_of(mod)
    return {"w": p["weight"].T.astype(np.float32),
            "b": p["bias"].astype(np.float32)}


def convert_kernelnn(obj) -> Tuple[dict, "GKNConfig"]:
    """Maps a reference KernelNN module tree onto (params, GKNConfig)."""
    from ..models.gkn import GKNConfig

    mods = _modules_of(obj)
    params: dict = {"fc1": _linear(mods["fc1"])}

    conv = mods["conv1"]
    cp = _params_of(conv)
    if cp.get("root") is not None:
        params["root"] = cp["root"].astype(np.float32)
    if cp.get("bias") is not None:
        params["bias"] = cp["bias"].astype(np.float32)

    knet = _modules_of(conv)["nn"]
    layer_list = _modules_of(knet)["layers"]
    kernel = []
    for key in sorted(_modules_of(layer_list), key=int):
        sub = _modules_of(layer_list)[key]
        p = _params_of(sub)
        if "weight" in p:  # Linear (skip activations)
            kernel.append({"w": p["weight"].T.astype(np.float32),
                           "b": p["bias"].astype(np.float32)})
    params["kernel"] = tuple(kernel)

    decoder_mlp = "fc3" in mods
    params["fc2"] = _linear(mods["fc2"])
    if decoder_mlp:
        params["fc3"] = _linear(mods["fc3"])

    width = params["fc1"]["w"].shape[1]
    ker_in = kernel[0]["w"].shape[0]
    kernel_layers = tuple([ker_in] + [l["w"].shape[1] for l in kernel])
    out_width = (params["fc3"]["w"].shape[1] if decoder_mlp
                 else params["fc2"]["w"].shape[1])
    cfg = GKNConfig(
        width=width,
        ker_width=params["fc2"]["w"].shape[1] if decoder_mlp else 0,
        depth=int(obj.__dict__.get("depth", 6)),
        ker_in=ker_in,
        in_width=params["fc1"]["w"].shape[0],
        out_width=out_width,
        kernel_layers=kernel_layers,
        # the shipped grain checkpoints' driver script is not in the repo;
        # the two-layer decoder matches neurips5_GKN.py:36-39 whose conv
        # loop skips the final ReLU
        relu_last=not decoder_mlp,
        decoder_mlp=decoder_mlp,
        aggr=str(conv.__dict__.get("aggr", "mean")),
    )
    return params, cfg


def load_reference_kernelnn(path: str):
    """One-call import: reference KernelNN pickle -> (params, GKNConfig)."""
    return convert_kernelnn(load_torch_module(path))


__all__ = ["load_torch_module", "convert_kernelnn",
           "load_reference_kernelnn"]
