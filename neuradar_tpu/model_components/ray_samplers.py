"""Ray samplers: spaced initial sampling, PDF resampling, proposal chains.

Functional JAX re-design of nerfstudio/model_components/ray_samplers.py. All
samplers are pure functions over dense [num_rays, num_samples] arrays:
stratification comes from explicit PRNG keys, PDF inversion is a batched
searchsorted, and the proposal chain simply threads density callables.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from neuradar_tpu.cameras.rays import RayBundle, RaySamples
from neuradar_tpu.utils.math import inv_power_fn, power_fn


def spaced_sampler(
    ray_bundle: RayBundle,
    num_samples: int,
    spacing_fn: Callable,
    spacing_fn_inv: Callable,
    rng: Optional[jax.Array] = None,
    single_jitter: bool = True,
) -> RaySamples:
    """Sample bins along rays under a spacing function (cf. SpacedSampler,
    ray_samplers.py:55-132). Stratified iff ``rng`` is given."""
    num_rays = ray_bundle.num_rays
    dtype = ray_bundle.origins.dtype
    bins = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=dtype)[None, :]  # [1, S+1]

    if rng is not None:
        shape = (num_rays, 1) if single_jitter else (num_rays, num_samples + 1)
        t_rand = jax.random.uniform(rng, shape, dtype)
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], -1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], -1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand
    else:
        bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))

    s_near = spacing_fn(ray_bundle.nears)
    s_far = spacing_fn(ray_bundle.fars)

    def spacing_to_euclidean_fn(x):
        return spacing_fn_inv(x * s_far + (1 - x) * s_near)

    euclidean_bins = spacing_to_euclidean_fn(bins)  # [R, S+1]
    return ray_bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
        spacing_to_euclidean_fn=spacing_to_euclidean_fn,
    )


def uniform_sampler(ray_bundle, num_samples, rng=None, single_jitter=True):
    return spaced_sampler(ray_bundle, num_samples, lambda x: x, lambda x: x, rng, single_jitter)


def lin_disp_piecewise_sampler(ray_bundle, num_samples, rng=None, single_jitter=True):
    """Half uniform, half linear-in-disparity (cf. ray_samplers.py:229)."""
    return spaced_sampler(
        ray_bundle,
        num_samples,
        lambda x: jnp.where(x < 1, x / 2, 1 - 1 / (2 * x)),
        lambda x: jnp.where(x < 0.5, 2 * x, 1 / (2 - 2 * x)),
        rng,
        single_jitter,
    )


def power_sampler(ray_bundle, num_samples, rng=None, single_jitter=True, lambda_: float = -1.0, scaling: float = 0.1):
    """ZipNeRF power-function spacing (cf. PowerSampler, ray_samplers.py:838;
    NeuRAD uses lambda=-1.0, scaling=0.1, neuradar.py:133-135)."""
    return spaced_sampler(
        ray_bundle,
        num_samples,
        lambda x: power_fn(x * scaling, lambda_),
        lambda x: inv_power_fn(x, lambda_) / scaling,
        rng,
        single_jitter,
    )


def pdf_sampler(
    ray_bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jax.Array,
    num_samples: int,
    rng: Optional[jax.Array] = None,
    single_jitter: bool = True,
    include_original: bool = False,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
) -> RaySamples:
    """Importance-resample bins from a weight histogram (cf. PDFSampler,
    ray_samplers.py:255-376)."""
    num_bins = num_samples + 1
    w = weights[..., 0] + histogram_padding  # [R, S]

    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jnp.maximum(eps - w_sum, 0.0)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(jnp.ones_like(pdf), jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, S+1]

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins, dtype=cdf.dtype)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_bins))
    if rng is not None:
        shape = (*cdf.shape[:-1], 1) if single_jitter else (*cdf.shape[:-1], num_bins)
        u = u + jax.random.uniform(rng, shape, cdf.dtype) / num_bins
    else:
        u = u + 1.0 / (2 * num_bins)

    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts[..., 0], ray_samples.spacing_ends[..., -1:, 0]], axis=-1
    )  # [R, S+1]

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, existing_bins.shape[-1] - 1)
    above = jnp.clip(inds, 0, existing_bins.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    bins_g0 = jnp.take_along_axis(existing_bins, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g1 = jnp.take_along_axis(existing_bins, above, axis=-1)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0, 1)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], -1), -1)

    bins = jax.lax.stop_gradient(bins)
    euclidean_bins = ray_samples.spacing_to_euclidean_fn(bins)
    return ray_bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
        spacing_to_euclidean_fn=ray_samples.spacing_to_euclidean_fn,
    )


def proposal_network_sampler(
    ray_bundle: RayBundle,
    density_fns: Sequence[Callable[[RaySamples], jax.Array]],
    num_proposal_samples_per_ray: Tuple[int, ...] = (128, 64),
    num_nerf_samples_per_ray: int = 32,
    rng: Optional[jax.Array] = None,
    single_jitter: bool = True,
    initial_sampler: Optional[Callable] = None,
    anneal: Optional[jax.Array] = None,
) -> Tuple[RaySamples, List[jax.Array], List[RaySamples]]:
    """Proposal-network sampling chain (cf. ProposalNetworkSampler,
    ray_samplers.py:569-666, with update_sched == always-update as configured
    by NeuRAD at models/neuradar.py:290).

    Args:
        density_fns: one callable per proposal round mapping RaySamples ->
            densities [R, S, 1].
        rng: PRNG key; None disables stratification (eval mode).
        anneal: proposal-weight exponent (float or traced scalar; None skips
            the power). anneal=0 resamples uniformly, 1 is the plain PDF —
            cf. reference use_proposal_weight_anneal (models/nerfacto.py:
            266-272), where it ramps 0->1 over the first
            proposal_weights_anneal_max_num_iters steps.

    Returns:
        final RaySamples, list of proposal weights, list of proposal samples.
    """
    if initial_sampler is None:
        initial_sampler = lin_disp_piecewise_sampler
    n_rounds = len(num_proposal_samples_per_ray)
    weights_list: List[jax.Array] = []
    samples_list: List[RaySamples] = []
    weights = None
    ray_samples = None
    keys = list(jax.random.split(rng, n_rounds + 1)) if rng is not None else [None] * (n_rounds + 1)
    for i_level in range(n_rounds + 1):
        is_prop = i_level < n_rounds
        num_samples = num_proposal_samples_per_ray[i_level] if is_prop else num_nerf_samples_per_ray
        if i_level == 0:
            ray_samples = initial_sampler(ray_bundle, num_samples, rng=keys[0], single_jitter=single_jitter)
        else:
            annealed = weights if anneal is None else weights**anneal
            ray_samples = pdf_sampler(
                ray_bundle, ray_samples, annealed, num_samples, rng=keys[i_level], single_jitter=single_jitter
            )
        if is_prop:
            density = density_fns[i_level](ray_samples)
            weights = ray_samples.get_weights(density)
            weights_list.append(weights)
            samples_list.append(ray_samples)
    return ray_samples, weights_list, samples_list
