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


def scale_by_adam_lowp_state(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15, state_dtype=None
) -> optax.GradientTransformation:
    """Adam whose BOTH moment buffers are stored in ``state_dtype`` (e.g.
    bf16) while every update computes in f32.

    HBM rationale (docs/PERFORMANCE.md "Full-step roofline"): the flat hash
    tables are ~600 MB f32, so their f32 mu+nu contribute ~2.4 GB of
    ray-independent read+write per step. bf16 moments halve that. Numerics:
    the EMA accumulates in f32 and rounds once per step; bf16's 8 mantissa
    bits mean relative increments below ~2^-8/(1-beta) can be lost — fine
    for the noisy table grads (validated by the learning check A/B), so this
    stays opt-in (table_moments_dtype) rather than reference-parity default.
    """
    if state_dtype is None:
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init(params):
        cast = lambda t: jax.tree.map(lambda x: jax.numpy.zeros_like(x, dtype=state_dtype), t)
        return optax.ScaleByAdamState(
            count=jax.numpy.zeros([], jax.numpy.int32), mu=cast(params), nu=cast(params)
        )

    def update(updates, state, params=None):
        del params
        f32 = jax.numpy.float32
        mu = jax.tree.map(lambda m, g: b1 * m.astype(f32) + (1 - b1) * g.astype(f32), state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v.astype(f32) + (1 - b2) * jax.numpy.square(g.astype(f32)),
                          state.nu, updates)
        count = state.count + 1
        bc1 = 1 - b1**count.astype(f32)
        bc2 = 1 - b2**count.astype(f32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jax.numpy.sqrt(v / bc2) + eps), mu, nu
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(state_dtype), mu),
            nu=jax.tree.map(lambda v: v.astype(state_dtype), nu),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


@dataclass
class AdamOptimizerConfig:
    """cf. AdamOptimizerConfig (engine/optimizers.py).

    mu_dtype: storage dtype for Adam's first moment (optax mu).
    moments_dtype: storage dtype for BOTH moments via
    scale_by_adam_lowp_state (takes precedence over mu_dtype). The ~600 MB
    hash tables carry f32 mu+nu whose read+write is part of the dominant
    ray-independent HBM bucket (docs/PERFORMANCE.md roofline); "bfloat16"
    halves that traffic. Default None (= f32, reference parity) — flip per
    group via default_optimizer_groups(table_moments_dtype=...) or the bench
    --table-moments-dtype A/B knob.
    """

    lr: float = 1e-3
    eps: float = 1e-15
    weight_decay: float = 0.0
    max_norm: Optional[float] = None
    mu_dtype: Optional[str] = None
    moments_dtype: Optional[str] = None

    def build(self, schedule: Callable) -> optax.GradientTransformation:
        if self.moments_dtype is not None:
            tx = [scale_by_adam_lowp_state(eps=self.eps, state_dtype=self.moments_dtype)]
        else:
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
    max_steps: int = 20001, table_mu_dtype: Optional[str] = None,
    table_moments_dtype: Optional[str] = None,
) -> Dict[str, OptimizerGroupConfig]:
    """The neuradar method's optimizer table (method_configs.py:384-409).

    table_mu_dtype / table_moments_dtype: optional Adam moment storage dtype
    for the 'hashgrids' group only (e.g. "bfloat16" halves the table-moment
    HBM traffic — scale_by_adam_lowp_state; None keeps f32 reference parity).
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
            AdamOptimizerConfig(lr=1e-2, eps=1e-15, mu_dtype=table_mu_dtype,
                                moments_dtype=table_moments_dtype),
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
