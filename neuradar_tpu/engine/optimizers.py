"""Per-parameter-group optimizers via optax.multi_transform.

cf. reference nerfstudio/engine/optimizers.py: the model's parameters are
split into named groups (hashgrids / fields / cnn / transformer /
trajectory_opt / camera_opt), each with its own Adam(W) settings and LR
schedule (configs/method_configs.py:384-409). Here the grouping is a pure
function of the flax param path, and all groups update inside one jitted
optax transform — no per-group Python loop in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import optax
from flax import traverse_util

from neuradar_tpu.engine.schedulers import ExponentialDecaySchedulerConfig


@dataclass
class AdamOptimizerConfig:
    """cf. AdamOptimizerConfig (engine/optimizers.py).

    mu_dtype: storage dtype for Adam's first moment (optax mu). The 537 MB
    hash tables carry f32 mu+nu whose read+write is part of the dominant
    ray-independent HBM bucket (docs/PERFORMANCE.md roofline); "bfloat16"
    halves mu traffic. Default None (= param dtype, reference parity) —
    flip per group via default_optimizer_groups(table_mu_dtype=...) or the
    bench --table-mu-dtype A/B knob.
    """

    lr: float = 1e-3
    eps: float = 1e-15
    weight_decay: float = 0.0
    max_norm: Optional[float] = None
    mu_dtype: Optional[str] = None

    def build(self, schedule: Callable) -> optax.GradientTransformation:
        tx = [optax.scale_by_adam(eps=self.eps, mu_dtype=self.mu_dtype)]
        if self.weight_decay:
            tx.append(optax.add_decayed_weights(self.weight_decay))
        if self.max_norm is not None:
            tx.insert(0, optax.clip_by_global_norm(self.max_norm))
        tx.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*tx)


@dataclass
class AdamWOptimizerConfig(AdamOptimizerConfig):
    weight_decay: float = 1e-2


@dataclass
class RAdamOptimizerConfig(AdamOptimizerConfig):
    def build(self, schedule: Callable) -> optax.GradientTransformation:
        tx = [optax.scale_by_radam(eps=self.eps)]
        if self.weight_decay:
            tx.append(optax.add_decayed_weights(self.weight_decay))
        if self.max_norm is not None:
            tx.insert(0, optax.clip_by_global_norm(self.max_norm))
        tx.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*tx)


@dataclass
class OptimizerGroupConfig:
    optimizer: AdamOptimizerConfig
    scheduler: Optional[ExponentialDecaySchedulerConfig] = None

    def build(self) -> optax.GradientTransformation:
        if self.scheduler is not None:
            schedule = self.scheduler.build(self.optimizer.lr)
        else:
            schedule = self.optimizer.lr
        return self.optimizer.build(schedule)


def param_group_label(path: Tuple[str, ...]) -> str:
    """Map a flax param path to its optimizer group.

    Mirrors the reference's get_param_groups plumbing (models/neuradar.py:
    338-354): hash tables -> 'hashgrids', actor trajectories ->
    'trajectory_opt', the rgb CNN -> 'cnn', the radar decoder + heads ->
    'transformer', camera poses -> 'camera_opt', VGG -> 'frozen', everything
    else (field MLPs, decoders, appearance, sdf beta) -> 'fields'.
    """
    joined = "/".join(str(p) for p in path)
    if "vgg_loss" in joined:
        return "frozen"
    if "hash_table" in joined:
        return "hashgrids"
    if joined.startswith("dynamic_actors"):
        return "trajectory_opt"
    if joined.startswith("rgb_decoder"):
        return "cnn"
    if joined.startswith("radar_decoder"):
        return "transformer"
    if joined.startswith("camera_optimizer"):
        return "camera_opt"
    return "fields"


def label_params(params) -> Any:
    flat = traverse_util.flatten_dict(params)
    labels = {k: param_group_label(k) for k in flat}
    return traverse_util.unflatten_dict(labels)


def default_optimizer_groups(
    max_steps: int = 20001, table_mu_dtype: Optional[str] = None
) -> Dict[str, OptimizerGroupConfig]:
    """The neuradar method's optimizer table (method_configs.py:384-409).

    table_mu_dtype: optional Adam first-moment storage dtype for the
    'hashgrids' group only (e.g. "bfloat16" to halve the table-mu HBM
    traffic; None keeps f32 reference parity).
    """
    exp = ExponentialDecaySchedulerConfig
    return {
        "trajectory_opt": OptimizerGroupConfig(
            AdamOptimizerConfig(lr=1e-3, eps=1e-15),
            exp(lr_final=1e-4, max_steps=max_steps, warmup_steps=2500),
        ),
        "cnn": OptimizerGroupConfig(
            AdamWOptimizerConfig(lr=1e-3, eps=1e-15, weight_decay=1e-6),
            exp(lr_final=1e-4, max_steps=max_steps, warmup_steps=2500),
        ),
        "fields": OptimizerGroupConfig(
            AdamWOptimizerConfig(lr=1e-2, eps=1e-15, weight_decay=1e-7),
            exp(lr_final=1e-3, max_steps=max_steps, warmup_steps=500),
        ),
        "hashgrids": OptimizerGroupConfig(
            AdamOptimizerConfig(lr=1e-2, eps=1e-15, mu_dtype=table_mu_dtype),
            exp(lr_final=1e-3, max_steps=max_steps, warmup_steps=500),
        ),
        "camera_opt": OptimizerGroupConfig(
            AdamOptimizerConfig(lr=1e-4, eps=1e-15),
            exp(lr_final=1e-5, max_steps=max_steps, warmup_steps=2500),
        ),
        "transformer": OptimizerGroupConfig(
            AdamWOptimizerConfig(lr=1e-3, eps=1e-15, weight_decay=1e-7),
            exp(lr_final=1e-7, max_steps=max(max_steps // 2, 1), warmup_steps=5000),
        ),
    }


def build_optimizer(params, groups: Dict[str, OptimizerGroupConfig]) -> optax.GradientTransformation:
    """One multi_transform over all param groups; unknown labels are frozen."""
    transforms = {name: g.build() for name, g in groups.items()}
    transforms["frozen"] = optax.set_to_zero()
    labels = label_params(params)
    # any label without a configured group is frozen
    flat = traverse_util.flatten_dict(labels)
    for k, v in flat.items():
        if v not in transforms:
            flat[k] = "frozen"
    labels = traverse_util.unflatten_dict(flat)
    return optax.multi_transform(transforms, labels)
