"""Multi-host initialization.

The reference has no distributed support (SURVEY.md section 2.6). For
multi-host TPU pods: call ``initialize()`` once per process before any
jax usage; `jax.distributed.initialize` wires the coordination service
and makes `jax.devices()` span the pod, after which the mesh/sharding
machinery in this package (parallel/mesh.py, parallel/sharding.py) works
unchanged — GSPMD routes intra-slice collectives over ICI and
inter-slice data parallelism over DCN.
"""
from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initializes jax.distributed (no-op on a single process when no
    coordinator is configured in the environment)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process / already initialized
        pass


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


__all__ = ["initialize", "is_multiprocess"]
