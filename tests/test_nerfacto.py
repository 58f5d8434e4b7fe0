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


def test_proposal_weight_anneal_ramp():
    """anneal_for_step follows the reference bias(x, b) ramp
    (models/nerfacto.py:266-272): 0 at step 0, ~1 at max_num_iters, and a
    traced step works inside jit without retriggering compilation."""
    model = NerfactoModel(config=small_cfg(), static_scale=10.0)
    n = model.config.proposal_weights_anneal_max_num_iters
    assert float(model.anneal_for_step(0)) == 0.0
    assert abs(float(model.anneal_for_step(n)) - 1.0) < 1e-6
    mid = float(model.anneal_for_step(n // 2))
    assert 0.5 < mid < 1.0  # slope 10 front-loads the ramp
    # traced: same jitted fn across steps (dynamic array arg)
    f = jax.jit(model.anneal_for_step)
    vals = [float(f(np.int32(s))) for s in (0, n // 4, n, 10 * n)]
    assert vals[0] == 0.0 and abs(vals[2] - 1.0) < 1e-6 and abs(vals[3] - 1.0) < 1e-6
    assert vals == sorted(vals)


def test_loss_and_metrics_with_traced_anneal():
    """The annealed sampler path runs under jit with a traced exponent."""
    model = NerfactoModel(config=small_cfg(), static_scale=10.0)
    bundle = make_bundle(32)
    batch = {"rgb": jnp.zeros((32, 3))}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    variables = jax.jit(functools.partial(model.init, train=True))(rngs, bundle)

    @jax.jit
    def loss_at(step):
        total, _ = model.apply(variables, bundle, batch, train=True,
                               anneal=model.anneal_for_step(step),
                               method=NerfactoModel.loss_and_metrics,
                               rngs={"sampling": jax.random.PRNGKey(2)})
        return total

    l0, l1 = float(loss_at(np.int32(0))), float(loss_at(np.int32(10_000)))
    assert np.isfinite(l0) and np.isfinite(l1)
