"""Optimizer/schedule/EMA recipe for VITS training.

The canonical VITS recipe: AdamW(b1=0.8, b2=0.99, eps=1e-9), lr 2e-4 with
exponential decay gamma=0.999875 per epoch, applied to both generator and
discriminator.  Plus a parameter EMA (common for vocoder quality) maintained
as a simple pytree update so serving can use the averaged weights.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def vits_learning_rate(
    base_lr: float = 2e-4,
    gamma_per_epoch: float = 0.999875,
    steps_per_epoch: int = 1000,
) -> optax.Schedule:
    """Per-step exponential decay matching the per-epoch VITS gamma."""
    per_step = gamma_per_epoch ** (1.0 / steps_per_epoch)
    return optax.exponential_decay(
        init_value=base_lr, transition_steps=1, decay_rate=per_step
    )


def vits_optimizer(
    base_lr: float = 2e-4,
    steps_per_epoch: int = 1000,
    clip_norm: float | None = 500.0,
) -> optax.GradientTransformation:
    schedule = vits_learning_rate(base_lr, steps_per_epoch=steps_per_epoch)
    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.adamw(schedule, b1=0.8, b2=0.99, eps=1e-9))
    return optax.chain(*chain)


class ParamEMA:
    """Exponential moving average over a params pytree (for serving weights)."""

    def __init__(self, decay: float = 0.9999):
        self.decay = decay

    def init(self, params: Any) -> Any:
        # Deep-copy: training steps donate their param buffers, and an EMA
        # aliasing them would read deleted arrays after the first step.
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x).copy(), params)

    def update(self, ema_params: Any, new_params: Any) -> Any:
        d = self.decay
        return jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, new_params
        )
