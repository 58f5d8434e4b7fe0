"""Sampler and renderer tests, mirroring the reference's
tests/model_components/test_ray_sampler.py and test_renderers.py plus
closed-form volume rendering checks."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.rays import RayBundle, render_weights_from_alpha, render_weights_from_density
from neuradar_tpu.model_components import ray_samplers, renderers


def make_bundle(num_rays=8, near=1.0, far=10.0):
    key = jax.random.PRNGKey(0)
    dirs = jax.random.normal(key, (num_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.zeros((num_rays, 3)),
        directions=dirs,
        pixel_area=jnp.ones((num_rays, 1)) * 1e-4,
        nears=jnp.full((num_rays, 1), near),
        fars=jnp.full((num_rays, 1), far),
        times=jnp.zeros((num_rays, 1)),
    )


def test_uniform_sampler_bounds():
    bundle = make_bundle()
    rs = ray_samplers.uniform_sampler(bundle, 32)
    assert rs.frustums.starts.shape == (8, 32, 1)
    np.testing.assert_allclose(np.asarray(rs.frustums.starts[:, 0, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs.frustums.ends[:, -1, 0]), 10.0, atol=1e-4)
    # deltas sum to far-near
    np.testing.assert_allclose(np.asarray(rs.deltas.sum(axis=1)[:, 0]), 9.0, rtol=1e-5)


def test_power_sampler_monotonic():
    bundle = make_bundle()
    rs = ray_samplers.power_sampler(bundle, 64, lambda_=-1.0, scaling=0.1)
    starts = np.asarray(rs.frustums.starts[..., 0])
    assert (np.diff(starts, axis=-1) > 0).all()
    np.testing.assert_allclose(starts[:, 0], 1.0, atol=1e-4)


def test_spaced_sampler_stratified_within_bins():
    bundle = make_bundle()
    rs = ray_samplers.uniform_sampler(bundle, 16, rng=jax.random.PRNGKey(3), single_jitter=True)
    s = np.asarray(rs.spacing_starts[..., 0])
    assert (np.diff(s, axis=-1) > 0).all()
    assert (s >= 0).all() and (s <= 1).all()


def test_pdf_sampler_concentrates():
    bundle = make_bundle()
    rs = ray_samplers.uniform_sampler(bundle, 32)
    # put all weight in bin 10
    weights = jnp.zeros((8, 32, 1)).at[:, 10, :].set(1.0)
    rs2 = ray_samplers.pdf_sampler(bundle, rs, weights, num_samples=16)
    centers = np.asarray((rs2.frustums.starts + rs2.frustums.ends)[..., 0] / 2)
    # bin 10 of 32 spans [1+9*10/32*...]; uniform spacing [1,10] -> bin width 9/32
    lo = 1.0 + 9.0 * 10 / 32
    hi = 1.0 + 9.0 * 11 / 32
    # histogram_padding=0.01 leaves ~1/1.32 of the mass in the hot bin
    frac_inside = ((centers >= lo - 0.1) & (centers <= hi + 0.1)).mean()
    assert frac_inside > 0.6


def test_get_weights_matches_closed_form():
    bundle = make_bundle(num_rays=4)
    rs = ray_samplers.uniform_sampler(bundle, 16)
    density = jnp.full((4, 16, 1), 0.5)
    w = rs.get_weights(density)
    # closed form: w_i = (1 - exp(-sigma*delta)) * exp(-sigma*sum(prev deltas))
    deltas = np.asarray(rs.deltas[..., 0])
    sigma = 0.5
    alphas = 1 - np.exp(-sigma * deltas)
    trans = np.exp(-sigma * np.concatenate([np.zeros_like(deltas[:, :1]), np.cumsum(deltas, 1)[:, :-1]], 1))
    np.testing.assert_allclose(np.asarray(w[..., 0]), alphas * trans, rtol=1e-4)


def test_weights_from_alpha():
    alphas = jnp.array([[0.5, 0.5, 1.0]])
    w = render_weights_from_alpha(alphas)
    np.testing.assert_allclose(np.asarray(w[0]), [0.5, 0.25, 0.25], rtol=1e-4)


def test_weights_from_density_matches_ray_samples():
    bundle = make_bundle(num_rays=4)
    rs = ray_samplers.uniform_sampler(bundle, 16)
    density = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 1))
    w1 = rs.get_weights(density)
    w2 = render_weights_from_density(
        rs.frustums.starts[..., 0], rs.frustums.ends[..., 0], density[..., 0]
    )
    np.testing.assert_allclose(np.asarray(w1[..., 0]), np.asarray(w2), rtol=1e-5)


def test_renderers_shapes_and_values():
    bundle = make_bundle(num_rays=4)
    rs = ray_samplers.uniform_sampler(bundle, 8)
    weights = jnp.ones((4, 8, 1)) / 8.0
    feats = jnp.ones((4, 8, 16))
    out = renderers.render_features(feats, weights)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
    acc = renderers.render_accumulation(weights)
    np.testing.assert_allclose(np.asarray(acc), 1.0, rtol=1e-5)
    depth = renderers.render_depth_simple(weights, rs)
    mid = np.asarray((rs.frustums.starts + rs.frustums.ends)[..., 0] / 2).mean(-1)
    np.testing.assert_allclose(np.asarray(depth[:, 0]), mid, rtol=1e-5)


def test_proposal_network_sampler_chain():
    bundle = make_bundle(num_rays=8)

    def density_fn(rs):
        return jnp.ones((*rs.shape, 1)) * 0.1

    final, weights_list, samples_list = ray_samplers.proposal_network_sampler(
        bundle, [density_fn, density_fn], (32, 16), 8, rng=jax.random.PRNGKey(0)
    )
    assert final.frustums.starts.shape == (8, 8, 1)
    assert len(weights_list) == 2 and len(samples_list) == 2
    assert weights_list[0].shape == (8, 32, 1)
    assert weights_list[1].shape == (8, 16, 1)
    # monotonically increasing bins everywhere
    for rs in samples_list + [final]:
        s = np.asarray(rs.frustums.starts[..., 0])
        e = np.asarray(rs.frustums.ends[..., 0])
        assert (e >= s).all()


def test_isotropic_gaussian_shapes():
    bundle = make_bundle(num_rays=4)
    rs = ray_samplers.uniform_sampler(bundle, 8)
    g = rs.frustums.get_fast_isotropic_gaussian(num_multisamples=2)
    assert g.mean.shape == (4, 8, 2, 3)
    assert g.std.shape == (4, 8, 2, 1)
    # means lie on the ray
    d = np.asarray(bundle.directions)[:, None, None, :]
    o = np.asarray(bundle.origins)[:, None, None, :]
    diff = np.asarray(g.mean) - o
    cross = np.cross(diff, np.broadcast_to(d, diff.shape))
    np.testing.assert_allclose(np.linalg.norm(cross, axis=-1), 0, atol=1e-4)
