"""Learning-rate schedules.

cosine_annealing mirrors torch.optim.lr_scheduler.CosineAnnealingLR stepped
once per optimizer step, T_max = total optimizer steps (the reference's
T_max = epochs * len(loader) / accum, src/trainer.py:85, is the same
quantity expressed in loader iterations):
lr(t) = eta_min + (lr0 - eta_min) * (1 + cos(pi * t / T_max)) / 2.
Past T_max the schedule holds at eta_min (the torch recurrence would climb
back up — we take the intended annealing semantics).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_annealing(lr0: float, t_max: int, eta_min: float = 0.0):
    def schedule(count):
        t = jnp.minimum(count, t_max)
        return eta_min + (lr0 - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t / t_max))

    return schedule


def make_optimizer(
    learning_rate: float,
    t_max: int,
    momentum: float = 0.9,
    weight_decay: float = 0.05,
    grad_clip=None,
    schedule: str = "cosine",
) -> optax.GradientTransformation:
    """SGD(momentum) + coupled L2 (torch-style: decay added to the gradient
    before the momentum buffer; reference: src/trainer.py:80-84) + cosine lr."""
    lr = cosine_annealing(learning_rate, t_max) if schedule == "cosine" else learning_rate
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(lr, momentum=momentum))
    return optax.chain(*parts)
