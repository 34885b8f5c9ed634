"""graph-pde-tpu: a TPU-native graph neural operator framework.

Re-implements the capabilities of neuraloperator/graph-pde (GKN and MGKN
graph kernel networks for parametric PDEs) as an idiomatic JAX/XLA/Pallas
framework: static-shape padded graphs, fused edge-kernel convolutions,
pjit/shard_map multi-chip scaling over device meshes.
"""

__version__ = "0.1.0"
