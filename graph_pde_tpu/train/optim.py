"""Optimizer: torch-parity Adam + StepLR.

The reference trains with ``torch.optim.Adam(lr, weight_decay=5e-4)`` plus
``StepLR(step_size, gamma)`` (graph-neural-operator/
UAI1_full_resolution.py:242-243). torch's Adam applies weight decay by
adding ``wd * p`` to the gradient *before* the moment updates, which in
optax is ``add_decayed_weights`` placed before ``scale_by_adam``.
"""
from __future__ import annotations

import optax


def step_lr(base_lr: float, steps_per_epoch: int, step_size_epochs: int,
            gamma: float):
    """StepLR as an optax schedule over optimizer steps."""
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * (gamma ** (epoch // step_size_epochs))
    return schedule


def adam_steplr(base_lr: float, *, weight_decay: float = 0.0,
                steps_per_epoch: int = 1, step_size_epochs: int = 50,
                gamma: float = 0.5, eps: float = 1e-8):
    """Adam(+L2-into-gradient weight decay) with step-decayed LR."""
    sched = step_lr(base_lr, steps_per_epoch, step_size_epochs, gamma)
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(eps=eps))
    parts.append(optax.scale_by_schedule(sched))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


__all__ = ["adam_steplr", "step_lr"]
