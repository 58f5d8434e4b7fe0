"""Camera (sensor pose) optimizers.

cf. reference nerfstudio/cameras/camera_optimizers.py: a learnable [num_frames,
6] tangent vector per sensor frame, exponentiated (SO3xR3 or SE3) and applied
to ray origins/directions. The scaled variant applies per-DOF weights
(neurad-scaleopt configs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.utils.poses import exp_map_SE3, exp_map_SO3xR3


def _safe_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2 norm with torch's subgradient-0 at exactly zero. jnp.linalg.norm's
    gradient at 0 is NaN (inf * 0 through sqrt'(0)), which poisons the very
    first optimizer step of a pose adjustment initialized at zeros."""
    sq = jnp.sum(x * x, axis=axis)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


@dataclass
class CameraOptimizerConfig:
    """cf. CameraOptimizerConfig (camera_optimizers.py:40)."""

    mode: str = "off"  # off | SO3xR3 | SE3
    trans_l2_penalty: Union[Tuple[float, float, float], float] = 1e-2
    rot_l2_penalty: float = 1e-3
    weights: Optional[Tuple[float, float, float, float, float, float]] = None
    """Per-DOF weights; set for the ScaledCameraOptimizer behavior (:204)."""


class CameraOptimizer(nn.Module):
    """Learnable per-frame pose refinement as a flax module."""

    config: CameraOptimizerConfig
    num_cameras: int

    def setup(self):
        if self.config.mode != "off":
            self.pose_adjustment = self.param(
                "pose_adjustment", lambda key: jnp.zeros((self.num_cameras, 6), jnp.float32)
            )

    def _adjustment(self) -> jax.Array:
        adj = self.pose_adjustment
        if self.config.weights is not None:
            adj = adj * jnp.asarray(self.config.weights, adj.dtype)
        return adj

    def __call__(self, indices: jax.Array) -> jax.Array:
        """Correction matrices [N, 3, 4] for the given frame indices."""
        if self.config.mode == "off":
            return jnp.broadcast_to(jnp.eye(3, 4), (indices.shape[0], 3, 4))
        tangent = self._adjustment()[indices]
        if self.config.mode == "SO3xR3":
            return exp_map_SO3xR3(tangent)
        if self.config.mode == "SE3":
            return exp_map_SE3(tangent)
        raise ValueError(self.config.mode)

    def apply_to_raybundle(self, ray_bundle: RayBundle) -> RayBundle:
        """Pose-correct ray origins/directions (cf. apply_to_raybundle, :152)."""
        if self.config.mode == "off" or ray_bundle.camera_indices is None:
            return ray_bundle
        corr = self(ray_bundle.camera_indices[..., 0])
        origins = ray_bundle.origins + corr[..., :3, 3]
        directions = jnp.einsum("rij,rj->ri", corr[..., :3, :3], ray_bundle.directions)
        return ray_bundle.replace(origins=origins, directions=directions)

    def regularization_loss(self) -> jax.Array:
        """cf. get_loss_dict (:168-176, scaled variant :236-244)."""
        if self.config.mode == "off":
            return jnp.asarray(0.0)
        adj = self._adjustment()
        if isinstance(self.config.trans_l2_penalty, tuple):
            trans_term = jnp.mean(jnp.abs(adj[:, :3]) * jnp.asarray(self.config.trans_l2_penalty))
        else:
            trans_term = jnp.mean(_safe_norm(adj[:, :3])) * self.config.trans_l2_penalty
        rot_term = jnp.mean(_safe_norm(adj[:, 3:])) * self.config.rot_l2_penalty
        return trans_term + rot_term

    def metrics(self) -> Dict[str, jax.Array]:
        if self.config.mode == "off":
            return {}
        adj = self._adjustment()
        return {
            "camera_opt_translation": jnp.linalg.norm(adj[:, :3]),
            "camera_opt_rotation": jnp.linalg.norm(adj[:, 3:]),
        }


@dataclass
class ScaledCameraOptimizerConfig(CameraOptimizerConfig):
    """Convenience preset matching the reference's ScaledCameraOptimizer."""

    mode: str = "SO3xR3"
    weights: Optional[Tuple[float, ...]] = (1.0, 1.0, 0.01, 0.01, 0.01, 1.0)
    trans_l2_penalty: Union[Tuple[float, float, float], float] = (1e-2, 1e-2, 1e-3)
