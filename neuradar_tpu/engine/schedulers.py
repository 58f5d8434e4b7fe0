"""Learning-rate schedules as optax-compatible callables.

cf. reference nerfstudio/engine/schedulers.py: exponential decay with
(cosine or linear) warmup, multi-step, cosine decay.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax.numpy as jnp


@dataclass
class ExponentialDecaySchedulerConfig:
    """cf. ExponentialDecaySchedulerConfig (schedulers.py:92-107)."""

    lr_pre_warmup: float = 1e-8
    lr_final: Optional[float] = None
    warmup_steps: int = 0
    max_steps: int = 100000
    ramp: str = "cosine"  # cosine | linear

    def build(self, lr_init: float) -> Callable:
        lr_final = self.lr_final if self.lr_final is not None else lr_init
        pre = self.lr_pre_warmup
        warm = self.warmup_steps
        span = max(self.max_steps - warm, 1)

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            if warm > 0:
                frac = jnp.clip(step / warm, 0, 1)
                if self.ramp == "cosine":
                    warm_lr = pre + (lr_init - pre) * jnp.sin(0.5 * jnp.pi * frac)
                else:
                    warm_lr = pre + (lr_init - pre) * frac
            else:
                warm_lr = jnp.asarray(lr_init)
            t = jnp.clip((step - warm) / span, 0, 1)
            decay_lr = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
            return jnp.where(step < warm, warm_lr, decay_lr)

        return schedule


@dataclass
class MultiStepSchedulerConfig:
    """cf. MultiStepSchedulerConfig (schedulers.py:64-75)."""

    max_steps: int = 1000000
    gamma: float = 0.33
    milestones: Tuple[int, ...] = (500000, 750000, 900000)

    def build(self, lr_init: float) -> Callable:
        milestones = jnp.asarray(self.milestones)

        def schedule(step):
            n = jnp.sum(step >= milestones)
            return lr_init * self.gamma**n

        return schedule


@dataclass
class CosineDecaySchedulerConfig:
    """cf. CosineDecaySchedulerConfig (schedulers.py:146-157)."""

    warm_up_end: int = 5000
    learning_rate_alpha: float = 0.05
    max_steps: int = 300000

    def build(self, lr_init: float) -> Callable:
        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            warm_factor = jnp.clip(step / max(self.warm_up_end, 1), 0, 1)
            alpha = self.learning_rate_alpha
            progress = jnp.clip((step - self.warm_up_end) / max(self.max_steps - self.warm_up_end, 1), 0, 1)
            decay_factor = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
            return lr_init * jnp.where(step < self.warm_up_end, warm_factor, decay_factor)

        return schedule
