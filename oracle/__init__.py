"""Plain-torch reference oracle.

An independent, reference-faithful re-implementation of the reference's
training semantics in torch WITHOUT PyTorch-Geometric (PyG's
``MessagePassing.propagate`` reduces to index_select + scatter-mean for
these models), used to produce trained-convergence rel-L2 A/B numbers
against the JAX framework on identical synthetic ``.mat`` data — the
BASELINE.md parity north star. Runs on CPU (this environment's torch is
CPU-only); protocols are scaled to single-core budgets with the SAME
scaled config on both sides.

Modules:
- torch_ref: the building blocks (normalizers, kernel MLP, NNConv_old
  semantics, LpLoss, Nystrom radius-graph construction), each citing the
  reference lines it reproduces.
- export_data: writes the shared synthetic .mat datasets both sides read.
- run_uai3: the UAI3_resolution.py protocol (GKN, Nystrom, multires
  zero-shot eval) at a configurable scale.
- run_mgkn_orthogonal: the MGKN_orthogonal_burgers1d.py protocol.
"""
