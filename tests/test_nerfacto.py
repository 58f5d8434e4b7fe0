"""Nerfacto / LidarNerfacto model family tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig


def _init_and_loss(model, rngs, bundle, batch):
    """Jitted init + one jitted loss_and_metrics eval (eager dispatch of the
    full program is ~5x slower on the 1-core CI host)."""
    init_fn = jax.jit(functools.partial(model.init, train=True, method=NerfactoModel.loss_and_metrics))
    variables = init_fn(rngs, bundle, batch)
    loss_fn = jax.jit(functools.partial(model.apply, train=True, method=NerfactoModel.loss_and_metrics))
    return variables, loss_fn(variables, bundle, batch, rngs=rngs)


def make_bundle(n=64):
    key = jax.random.PRNGKey(0)
    dirs = jax.random.normal(key, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=dirs,
        pixel_area=jnp.full((n, 1), 1e-4),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
    )


def small_cfg(**kw):
    return NerfactoModelConfig(
        num_levels=4, log2_hashmap_size=12, max_res=256,
        num_proposal_samples_per_ray=(16, 8), num_nerf_samples_per_ray=8,
        hidden_dim=16, hidden_dim_color=16, appearance_embedding_dim=8, **kw
    )


def test_nerfacto_forward_and_loss():
    model = NerfactoModel(config=small_cfg(), static_scale=100.0, num_embeds=2)
    bundle = make_bundle()
    batch = {"rgb": jax.random.uniform(jax.random.PRNGKey(1), (64, 3))}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    variables, (total, (loss_dict, metrics, outputs)) = _init_and_loss(model, rngs, bundle, batch)
    assert np.isfinite(float(total))
    assert outputs["rgb"].shape == (64, 3)
    assert "interlevel_loss" in loss_dict and "psnr" in metrics


def test_lidar_nerfacto_heads():
    model = NerfactoModel(config=small_cfg(predict_lidar=True), static_scale=100.0)
    bundle = make_bundle(32)
    batch = {
        "rgb": jax.random.uniform(jax.random.PRNGKey(1), (32, 3)),
        "lidar_distance": jnp.full((32, 1), 10.0),
        "lidar_intensity": jnp.full((32, 1), 0.5),
        "did_return": jnp.ones((32, 1), bool),
    }
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    variables, (total, (loss_dict, metrics, outputs)) = _init_and_loss(model, rngs, bundle, batch)
    assert np.isfinite(float(total))
    assert "depth_loss" in loss_dict and "ray_drop_loss" in loss_dict
    assert outputs["intensity"].shape == (32, 1)


def test_query_rgb_at_points():
    """query_rgb: per-point color query for mesh texturing (degenerate
    1-sample RaySamples at world positions)."""
    model = NerfactoModel(config=small_cfg(), static_scale=10.0)
    bundle = make_bundle(8)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, bundle)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (16, 3)), jnp.float32)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (16, 1))
    rgb = model.apply(variables, pts, dirs, method=NerfactoModel.query_rgb)
    assert rgb.shape == (16, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
