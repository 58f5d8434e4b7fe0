"""Dynamic actors: optimizable rigid trajectories for moving objects.

cf. reference nerfstudio/model_components/dynamic_actors.py. TPU-first
redesign: instead of `nonzero()`-driven ragged (ray, sample, actor) index
lists (neurad_encoding.py:231-275), we select a static top-K set of candidate
actors per ray (by point-line distance, the reference's same pruning test) and
do masked dense per-sample in-box tests downstream. The reference tolerates
duplicate matches being "randomly discarded" (:268-274), so per-sample top-1
is behaviorally equivalent.

Trajectories are stored as 6D rotations + positions at the scene's unique
timestamps and linearly interpolated at ray times (poses.py:90).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from neuradar_tpu.utils import poses as pose_utils


@dataclass
class DynamicActorsConfig:
    """cf. reference DynamicActorsConfig (dynamic_actors.py:31)."""

    optimize_trajectories: bool = True
    actor_bbox_padding: Tuple[float, float, float] = (0.25, 0.25, 0.1)
    max_actors_per_ray: int = 8
    """Static per-ray candidate budget (TPU re-design; reference is ragged)."""


@struct.dataclass
class ActorTrajectories:
    """Static per-scene actor data (device constants, not parameters)."""

    unique_timestamps: jax.Array  # [T]
    poses_9d: jax.Array  # [T, A, 9] initial 6d rot + position
    present: jax.Array  # [T, A] bool
    sizes: jax.Array  # [A, 3] wlh
    symmetric: jax.Array  # [A] bool
    deformable: jax.Array  # [A] bool

    @property
    def n_actors(self) -> int:
        return self.poses_9d.shape[1]

    @property
    def n_times(self) -> int:
        return self.poses_9d.shape[0]


def trajectories_from_dicts(trajectories) -> ActorTrajectories:
    """Build ActorTrajectories from dataparser dicts with keys
    {timestamps [N], poses [N, 4, 4] or [N, 3, 4], dims [3], symmetric, deformable}.

    cf. reference DynamicActors._populate_actors (dynamic_actors.py:98-147):
    missing timestamps are filled with the nearest available pose.
    """
    if not trajectories:
        return ActorTrajectories(
            unique_timestamps=jnp.zeros((1,), jnp.float32),
            poses_9d=jnp.zeros((1, 0, 9), jnp.float32),
            present=jnp.zeros((1, 0), bool),
            sizes=jnp.zeros((0, 3), jnp.float32),
            symmetric=jnp.zeros((0,), bool),
            deformable=jnp.zeros((0,), bool),
        )
    all_ts = sorted({float(t) for traj in trajectories for t in np.asarray(traj["timestamps"]).reshape(-1)})
    unique_ts = np.asarray(all_ts, np.float32)
    T, A = len(unique_ts), len(trajectories)
    poses_9d = np.zeros((T, A, 9), np.float32)
    present = np.zeros((T, A), bool)
    sizes = np.zeros((A, 3), np.float32)
    symmetric = np.zeros((A,), bool)
    deformable = np.zeros((A,), bool)
    for a, traj in enumerate(trajectories):
        ts = np.asarray(traj["timestamps"], np.float32).reshape(-1)
        mats = np.asarray(traj["poses"], np.float32)
        sizes[a] = np.asarray(traj["dims"], np.float32).reshape(3)
        symmetric[a] = bool(traj.get("symmetric", False))
        deformable[a] = bool(traj.get("deformable", False))
        for ti, t in enumerate(unique_ts):
            diffs = np.abs(ts - t)
            j = int(diffs.argmin())
            rot6 = mats[j, :2, :3].reshape(6)
            pos = mats[j, :3, 3]
            poses_9d[ti, a, :6] = rot6
            poses_9d[ti, a, 6:] = pos
            if diffs[j] < 1e-4:
                present[ti, a] = True
    return ActorTrajectories(
        unique_timestamps=jnp.asarray(unique_ts),
        poses_9d=jnp.asarray(poses_9d),
        present=jnp.asarray(present),
        sizes=jnp.asarray(sizes),
        symmetric=jnp.asarray(symmetric),
        deformable=jnp.asarray(deformable),
    )


@struct.dataclass
class ActorCandidates:
    """Per-ray static top-K actor candidate set (pytree).

    Replaces the reference's ragged (ray_idx, sample_idx, actor_idx) triplets
    with fixed [num_rays, K] fields. ``valid`` marks real candidates.
    """

    w2b: jax.Array  # [R, K, 3, 4] world -> box
    center: jax.Array  # [R, K, 3] actor center in world
    bounds: jax.Array  # [R, K, 3] half-size + padding
    radius: jax.Array  # [R, K]
    actor_id: jax.Array  # [R, K] int32 (grid index via actor_to_id)
    valid: jax.Array  # [R, K] bool
    flip: jax.Array  # [R] float (+1/-1 random x-flip augmentation)

    def stop_gradient(self) -> "ActorCandidates":
        return jax.tree.map(jax.lax.stop_gradient, self)


@struct.dataclass
class ActorEdits:
    """Viewer/render-script actor editing (cf. dynamic_actors.py:158-181).

    A pytree: the numeric fields are traced through jit, so the viewer can
    sweep shift/rotation values without recompiling (only `remove`, which
    changes the graph, is a static leaf)."""

    lateral: float = 0.0
    longitudinal: float = 0.0
    rotation: float = 0.0
    index: int = -1  # -1 = all actors
    remove: bool = struct.field(pytree_node=False, default=False)
    # teleport selected actors out of the scene
    # (cf. the reference's actor-removal rendering, render_radar.py:603)


class DynamicActors(nn.Module):
    """Optimizable actor trajectories as a flax module.

    Parameters: actor_positions [T, A, 3] and actor_rotations_6d [T, A, 6],
    initialized from the dataparser trajectories (cf. dynamic_actors.py:144).
    """

    trajectories: ActorTrajectories
    config: DynamicActorsConfig = dataclass_field(default_factory=DynamicActorsConfig)

    def setup(self):
        traj = self.trajectories
        init_pos = traj.poses_9d[..., 6:9]
        init_rot = traj.poses_9d[..., :6]
        self.actor_positions = self.param("actor_positions", lambda key: init_pos)
        self.actor_rotations_6d = self.param("actor_rotations_6d", lambda key: init_rot)
        # duplicate-able mapping from actor index to hashgrid id (cf. :141)
        self.actor_to_id = jnp.arange(traj.n_actors, dtype=jnp.int32)

    @property
    def n_actors(self) -> int:
        return self.trajectories.n_actors

    def actor_bounds(self) -> jax.Array:
        """Half-extent + padding per actor [A, 3] (cf. :95-96)."""
        pad = jnp.asarray(self.config.actor_bbox_padding, jnp.float32)
        return self.trajectories.sizes / 2 + pad

    def _poses_9d(self) -> jax.Array:
        pos = self.actor_positions
        rot = self.actor_rotations_6d
        if not self.config.optimize_trajectories:
            pos = jax.lax.stop_gradient(pos)
            rot = jax.lax.stop_gradient(rot)
        return jnp.concatenate([rot, pos], axis=-1)

    def get_boxes2world(self, query_times: jax.Array, edits: Optional[ActorEdits] = None):
        """Dense boxes2world at query times: ([Q, A, 3, 4], valid [Q, A]).

        cf. reference get_boxes2world (dynamic_actors.py:183-197).
        """
        poses9, valid = pose_utils.interpolate_trajectories_6d(
            self._poses_9d(), self.trajectories.unique_timestamps, query_times, self.trajectories.present
        )
        b2w = pose_utils.interpolate_poses_9d_to_matrices(poses9)
        if edits is not None:
            b2w = self._apply_edits(b2w, edits)
        return b2w, valid

    def _apply_edits(self, b2w: jax.Array, edits: ActorEdits) -> jax.Array:
        """Shift/rotate selected actors (cf. edit_boxes2world, :158-181).

        Numeric edit fields may be traced (viewer sweeps) or plain floats
        (render scripts); only `remove` branches the graph."""
        concrete = all(isinstance(v, (int, float)) for v in (edits.lateral, edits.longitudinal, edits.rotation))
        if concrete and not edits.remove and (edits.lateral, edits.longitudinal, edits.rotation) == (0.0, 0.0, 0.0):
            return b2w
        A = b2w.shape[1]
        idx = jnp.asarray(edits.index, jnp.int32)
        sel = (idx < 0) | (jnp.arange(A) == idx)  # [A]
        if edits.remove:
            # push far outside the scene box: no ray/box hit can survive
            far = b2w[..., :3, 3] + jnp.asarray([0.0, 0.0, 1e6], b2w.dtype)
            gone = jnp.concatenate([b2w[..., :3, :3], far[..., None]], axis=-1)
            return jnp.where(sel[None, :, None, None], gone, b2w)
        shift = jnp.stack(
            [jnp.asarray(edits.lateral, b2w.dtype), jnp.asarray(edits.longitudinal, b2w.dtype),
             jnp.asarray(0.0, b2w.dtype)]
        )
        new_t = b2w[..., :3, 3] + jnp.einsum("qaij,j->qai", b2w[..., :3, :3], shift)
        rot = jnp.asarray(edits.rotation, b2w.dtype)
        c, s = jnp.cos(rot), jnp.sin(rot)
        zero, one = jnp.zeros_like(c), jnp.ones_like(c)
        rot_yaw = jnp.stack(
            [jnp.stack([c, -s, zero]), jnp.stack([s, c, zero]), jnp.stack([zero, zero, one])]
        )
        new_R = jnp.einsum("ij,qajk->qaik", rot_yaw, b2w[..., :3, :3])
        edited = jnp.concatenate([new_R, new_t[..., None]], axis=-1)
        return jnp.where(sel[None, :, None, None], edited, b2w)

    def get_ray_candidates(
        self,
        ray_times: jax.Array,
        line_points: jax.Array,
        line_dirs: jax.Array,
        flip_rng: Optional[jax.Array] = None,
        flip_prob: float = 0.0,
        edits: Optional[ActorEdits] = None,
    ) -> ActorCandidates:
        """Select the K nearest candidate actors per ray.

        Implements the same pruning as the reference's _get_actor_indices
        (neurad_encoding.py:231-246): point-line distance from the actor
        center to the ray line must be below the actor's bounding radius.
        Top-K (by distance) with a validity mask makes it static-shape.

        Args:
            ray_times: [R] per-ray times.
            line_points: [R, 3] a point on each ray (origin).
            line_dirs: [R, 3] normalized ray directions.
            flip_rng: PRNG key for the random x-flip augmentation (train).
        """
        K = min(self.config.max_actors_per_ray, max(self.n_actors, 1))
        R = ray_times.shape[0]
        if self.n_actors == 0:
            return _empty_candidates(R, K)

        b2w, valid = self.get_boxes2world(ray_times, edits)  # [R, A, 3, 4], [R, A]
        centers = b2w[..., :3, 3]  # [R, A, 3]
        bounds_all = self.actor_bounds()  # [A, 3]
        radii = jnp.linalg.norm(bounds_all, axis=-1)  # [A]

        # point-line distance from each actor center to each ray
        vec = centers - line_points[:, None, :]  # [R, A, 3]
        cross = jnp.cross(vec, line_dirs[:, None, :])
        dist = jnp.linalg.norm(cross, axis=-1)  # [R, A]
        close = (dist < radii[None, :]) & valid

        score = jnp.where(close, dist, jnp.inf)
        k_score, k_idx = jax.lax.top_k(-score, K)  # nearest K
        cand_valid = jnp.isfinite(-k_score)  # [R, K]

        b2w_k = jnp.take_along_axis(b2w, k_idx[..., None, None], axis=1)  # [R, K, 3, 4]
        w2b_k = pose_utils.inverse(b2w_k)
        center_k = b2w_k[..., :3, 3]
        bounds_k = bounds_all[k_idx]  # [R, K, 3]
        radius_k = radii[k_idx]
        actor_id_k = self.actor_to_id[k_idx]

        if flip_rng is not None and flip_prob > 0.0:
            flip = jnp.where(jax.random.bernoulli(flip_rng, flip_prob, (R,)), -1.0, 1.0)
        else:
            flip = jnp.ones((R,), jnp.float32)

        return ActorCandidates(
            w2b=w2b_k,
            center=center_k,
            bounds=bounds_k,
            radius=radius_k,
            actor_id=actor_id_k.astype(jnp.int32),
            valid=cand_valid,
            flip=flip,
        )


def _empty_candidates(num_rays: int, k: int) -> ActorCandidates:
    return ActorCandidates(
        w2b=jnp.zeros((num_rays, k, 3, 4)),
        center=jnp.zeros((num_rays, k, 3)),
        bounds=jnp.zeros((num_rays, k, 3)),
        radius=jnp.zeros((num_rays, k)),
        actor_id=jnp.zeros((num_rays, k), jnp.int32),
        valid=jnp.zeros((num_rays, k), bool),
        flip=jnp.ones((num_rays,)),
    )


def assign_samples_to_actors(
    candidates: ActorCandidates, sample_positions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample actor assignment among the ray's K candidates.

    Mirrors the reference's within-range + inside-box tests
    (neurad_encoding.py:254-267) with dense masks; picks the first valid
    candidate (duplicates are dropped, matching the reference's
    "randomly discard" semantics at :268-274).

    TPU note: a Python loop over the (static, tiny) K axis with [R, S]
    component arrays — no [R, S, K, 3] tensors, whose 128-lane padding would
    blow up HBM (TPU tiles the last two dims to (8, 128)).

    Args:
        candidates: per-ray candidates.
        sample_positions: [R, S, 3] sample mean positions (world frame).

    Returns:
        sel [R, S] int32 candidate index, has_actor [R, S] bool.
    """
    R, S = sample_positions.shape[:2]
    K = candidates.valid.shape[1]
    px = sample_positions[..., 0]  # [R, S]
    py = sample_positions[..., 1]
    pz = sample_positions[..., 2]

    sel = jnp.zeros((R, S), jnp.int32)
    has_actor = jnp.zeros((R, S), bool)
    for k in range(K):
        cx = candidates.center[:, k, 0:1]  # [R, 1] broadcasts over S
        cy = candidates.center[:, k, 1:2]
        cz = candidates.center[:, k, 2:3]
        dx, dy, dz = px - cx, py - cy, pz - cz
        within = dx * dx + dy * dy + dz * dz < candidates.radius[:, k, None] ** 2

        w2b = candidates.w2b[:, k]  # [R, 3, 4]
        inside = within
        for i in range(3):
            pib_i = (
                w2b[:, i, 0:1] * px + w2b[:, i, 1:2] * py + w2b[:, i, 2:3] * pz + w2b[:, i, 3:4]
            )  # [R, S]
            inside = inside & (jnp.abs(pib_i) < candidates.bounds[:, k, i, None])
        ok = inside & candidates.valid[:, k, None]
        new = ok & ~has_actor
        sel = jnp.where(new, k, sel)
        has_actor = has_actor | ok
    return sel, has_actor


def gather_selected_w2b_components(candidates: ActorCandidates, sel: jax.Array) -> list:
    """Per-sample w2b of the selected candidate as 12 [R, S] component arrays
    (TPU-friendly: avoids a [R, S, 3, 4] gather whose (8, 128) tile padding is
    ~10x)."""
    comps = []
    for i in range(3):
        row = []
        for j in range(4):
            row.append(jnp.take_along_axis(candidates.w2b[:, :, i, j], sel, axis=1))  # [R, S]
        comps.append(row)
    return comps
