"""Ray datastructures as JAX pytrees.

Dense, static-shape re-design of the reference's TensorDataclass ray
containers (nerfstudio/cameras/rays.py): a RayBundle is a flat [num_rays, ...]
struct, RaySamples is [num_rays, num_samples, ...]. Ray-level quantities stay
[num_rays, ...] and broadcast against the samples axis instead of being
materialized per sample. All containers are flax.struct pytrees so they flow
through jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from neuradar_tpu.utils.math import GaussiansStd


@struct.dataclass
class Frustums:
    """Frustum regions along rays, cf. reference cameras/rays.py:34.

    origins/directions are per-ray [R, 3]; starts/ends per-sample [R, S, 1];
    pixel_area per-ray [R, 1].
    """

    origins: jax.Array
    directions: jax.Array
    starts: jax.Array
    ends: jax.Array
    pixel_area: jax.Array

    def get_positions(self) -> jax.Array:
        """Center positions of each frustum: [R, S, 3]."""
        t = (self.starts + self.ends) / 2.0
        return self.origins[..., None, :] + self.directions[..., None, :] * t

    def get_start_positions(self) -> jax.Array:
        return self.origins[..., None, :] + self.directions[..., None, :] * self.starts

    def get_fast_isotropic_gaussian(self, num_multisamples: int = 1) -> GaussiansStd:
        """Fast isotropic gaussian approximation of the conical frustum.

        cf. reference cameras/rays.py:109-124. Returns mean [R, S, M, 3] and
        std [R, S, M, 1].
        """
        multisample_dist = (self.ends - self.starts) / (num_multisamples + 1)  # [R, S, 1]
        ts = jnp.arange(1, num_multisamples + 1, dtype=self.ends.dtype)
        t = self.starts + ts * multisample_dist  # [R, S, M]
        mean = self.origins[..., None, None, :] + self.directions[..., None, None, :] * t[..., None]
        area = self.pixel_area[..., None, None, :] * t[..., None] ** 2
        std = (area * multisample_dist[..., None, :]) ** (1.0 / 3.0)
        return GaussiansStd(mean=mean, std=std)

    def get_hexagonal_gaussian(self) -> GaussiansStd:
        """ZipNeRF 6-point hexagonal multisample (cf. reference
        utils/math.py:230-320); heavier but more accurate than the fast
        isotropic default."""
        from neuradar_tpu.utils.math import hexify_frustums

        return hexify_frustums(self.origins, self.directions, self.starts, self.ends, self.pixel_area)


@struct.dataclass
class RaySamples:
    """Samples along rays, cf. reference cameras/rays.py:143.

    spacing_* live in the normalized [0, 1] "s" domain of the spacing
    function; spacing_to_euclidean_fn converts back. The callable is a static
    (non-pytree) field — RaySamples never cross a jit boundary in this design.
    """

    frustums: Frustums
    deltas: jax.Array  # [R, S, 1]
    spacing_starts: Optional[jax.Array] = None  # [R, S, 1]
    spacing_ends: Optional[jax.Array] = None  # [R, S, 1]
    times: Optional[jax.Array] = None  # [R, 1]
    metadata: Dict[str, jax.Array] = struct.field(default_factory=dict)
    spacing_to_euclidean_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)

    @property
    def shape(self):
        return self.frustums.starts.shape[:-1]

    def get_weights(self, densities: jax.Array) -> jax.Array:
        """Volume rendering weights from densities, cf. rays.py:188-210.

        densities: [R, S, 1] -> weights [R, S, 1]. Replaces
        nerfacc.render_weight_from_density with a vectorized cumsum over the
        dense samples axis (XLA fuses exp/cumsum on TPU).
        """
        delta_density = self.deltas * densities
        alphas = 1 - jnp.exp(-delta_density)
        transmittance = jnp.cumsum(delta_density[..., :-1, :], axis=-2)
        transmittance = jnp.concatenate(
            [jnp.zeros_like(transmittance[..., :1, :]), transmittance], axis=-2
        )
        transmittance = jnp.exp(-transmittance)
        weights = alphas * transmittance
        return jnp.nan_to_num(weights)


def render_weights_from_alpha(alphas: jax.Array) -> jax.Array:
    """Weights from per-sample alphas via exclusive cumprod of (1 - alpha).

    Replaces nerfacc.render_weight_from_alpha (used by the SDF path at
    reference models/neuradar.py:1016) on the dense samples axis.
    alphas: [..., S] -> weights [..., S].
    """
    one_minus = 1.0 - alphas + 1e-7
    trans = jnp.cumprod(one_minus, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return alphas * trans


def render_weights_from_density(t_starts: jax.Array, t_ends: jax.Array, sigmas: jax.Array) -> jax.Array:
    """Weights from densities on [..., S] intervals.

    Replaces nerfacc.render_weight_from_density (reference neuradar.py:1018).
    """
    delta_density = (t_ends - t_starts) * sigmas
    alphas = 1 - jnp.exp(-delta_density)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(delta_density[..., :1]), jnp.cumsum(delta_density[..., :-1], axis=-1)], axis=-1
    ))
    return alphas * trans


@struct.dataclass
class RayBundle:
    """A flat bundle of rays, cf. reference cameras/rays.py:252."""

    origins: jax.Array  # [R, 3]
    directions: jax.Array  # [R, 3]
    pixel_area: jax.Array  # [R, 1]
    nears: Optional[jax.Array] = None  # [R, 1]
    fars: Optional[jax.Array] = None  # [R, 1]
    times: Optional[jax.Array] = None  # [R, 1]
    camera_indices: Optional[jax.Array] = None  # [R, 1]
    metadata: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]

    def get_ray_samples(
        self,
        bin_starts: jax.Array,
        bin_ends: jax.Array,
        spacing_starts: Optional[jax.Array] = None,
        spacing_ends: Optional[jax.Array] = None,
        spacing_to_euclidean_fn: Optional[Callable] = None,
    ) -> RaySamples:
        """Build RaySamples from per-ray sample bins, cf. rays.py:313."""
        frustums = Frustums(
            origins=self.origins,
            directions=self.directions,
            starts=bin_starts,
            ends=bin_ends,
            pixel_area=self.pixel_area,
        )
        return RaySamples(
            frustums=frustums,
            deltas=bin_ends - bin_starts,
            spacing_starts=spacing_starts,
            spacing_ends=spacing_ends,
            spacing_to_euclidean_fn=spacing_to_euclidean_fn,
            times=self.times,
            metadata=self.metadata,
        )


def concatenate_ray_bundles(bundles) -> RayBundle:
    """Concatenate ray bundles along the ray axis (cf. TensorDataclass.cat).

    Metadata keys present in only some bundles are DROPPED (intersection
    semantics), and optional fields (nears/fars/times/...) become None if any
    bundle lacks them. For modality-aware merging with key-union zero-fill
    semantics use data.datamanager.merge_modality_bundles — the product path.
    """
    def cat(*xs):
        return jnp.concatenate(xs, axis=0)

    base = bundles[0]
    kwargs = {}
    for name in ("origins", "directions", "pixel_area", "nears", "fars", "times", "camera_indices"):
        vals = [getattr(b, name) for b in bundles]
        kwargs[name] = None if any(v is None for v in vals) else cat(*vals)
    keys = set(base.metadata.keys())
    metadata = {k: cat(*[b.metadata[k] for b in bundles]) for k in keys if all(k in b.metadata for b in bundles)}
    return RayBundle(metadata=metadata, **kwargs)
