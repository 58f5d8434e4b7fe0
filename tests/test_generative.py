"""Diffusion guidance (generative/diffusion.py): the predictor trains, the
sampler runs, SDS pulls an image toward the learned distribution, and
positional conditioning matches the reference's angle logic
(stable_diffusion.py:128-170, positional_text_embeddings.py:92-121)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neuradar_tpu.generative import (
    PositionalEmbeddings,
    ScoreDistillationGuidance,
    TinyNoisePredictor,
    add_noise,
    alpha_bar,
    ddim_sample,
    denoising_loss,
)


def _toy_data(key, n=32, h=8, w=8, c=1):
    """x0 ~ constant +0.8 images with small noise: a sharp, learnable mode."""
    return 0.8 + 0.05 * jax.random.normal(key, (n, h, w, c))


@pytest.fixture(scope="module")
def trained_predictor():
    model = TinyNoisePredictor(hidden=16)
    rng = jax.random.PRNGKey(0)
    x0 = _toy_data(rng)
    params = model.init(rng, x0, jnp.full((x0.shape[0],), 0.5), None)
    predict = lambda p, x, t, c: model.apply(p, x, t, c)

    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        loss, g = jax.value_and_grad(lambda p: denoising_loss(predict, p, key, x0))(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    losses = []
    for i in range(150):
        params, state, loss = step(params, state, jax.random.PRNGKey(i + 1))
        losses.append(float(loss))
    return model, predict, params, losses


def test_schedule_endpoints():
    assert float(alpha_bar(jnp.float32(0.0))) > 0.99
    assert float(alpha_bar(jnp.float32(1.0))) < 0.01
    x = jnp.ones((2, 4, 4, 1))
    eps = jnp.zeros_like(x)
    near0 = add_noise(x, eps, jnp.full((2,), 0.01))
    assert np.allclose(np.asarray(near0), np.asarray(x), atol=0.05)


def test_denoising_training_converges(trained_predictor):
    _, _, _, losses = trained_predictor
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


def test_ddim_sample_approaches_data_mode(trained_predictor):
    model, predict, params, _ = trained_predictor
    out = ddim_sample(predict, params, jax.random.PRNGKey(7), (4, 8, 8, 1), num_steps=30)
    assert np.all(np.isfinite(np.asarray(out)))
    # the toy mode is +0.8; a briefly-trained predictor should pull samples
    # decisively positive even if not all the way
    assert float(out.mean()) > 0.3


def test_sds_loss_gradient_matches_reference_trick(trained_predictor):
    """d(sds_loss)/d(image) must equal w * (eps_pred - eps) (the stop-grad
    target construction, reference stable_diffusion.py:164-168)."""
    model, predict, params, _ = trained_predictor
    sds = ScoreDistillationGuidance(predict=predict, params=params)
    img = jnp.zeros((2, 8, 8, 1))
    g = jax.grad(lambda im: sds.sds_loss(jax.random.PRNGKey(3), im))(img)
    assert g.shape == img.shape and np.all(np.isfinite(np.asarray(g)))
    # gradient-descent on SDS moves the image toward the learned mode (+0.8):
    # the predictor sees x_t as "too negative", eps_pred < eps, grad < 0
    assert float(g.mean()) < 0.0


def test_sds_descent_moves_image_toward_mode(trained_predictor):
    model, predict, params, _ = trained_predictor
    sds = ScoreDistillationGuidance(predict=predict, params=params)
    img = jnp.zeros((1, 8, 8, 1))

    @jax.jit
    def step(img, key):
        g = jax.grad(lambda im: sds.sds_loss(key, im))(img)
        return img - 0.5 * g

    for i in range(40):
        img = step(img, jax.random.PRNGKey(100 + i))
    assert float(img.mean()) > 0.1


def test_sds_requires_a_predictor():
    with pytest.raises(RuntimeError, match="zero-egress"):
        ScoreDistillationGuidance()


def test_positional_embeddings_discrete_and_interpolated():
    base, top, side, back, front = (jnp.full((2,), v) for v in (0.0, 1.0, 2.0, 3.0, 4.0))
    pe = PositionalEmbeddings(base, top, side, back, front, mode="discrete")
    assert float(pe(10, 0)[0]) == 1.0      # low vertical angle -> top
    assert float(pe(80, 0)[0]) == 4.0      # front
    assert float(pe(80, 90)[0]) == 2.0     # side
    assert float(pe(80, 180)[0]) == 3.0    # back
    assert float(pe(80, 300)[0]) == 2.0    # other side
    assert float(pe(80, -60)[0]) == 2.0    # wraps to 300

    pe_i = PositionalEmbeddings(base, top, side, back, front, mode="interpolated")
    # at v=90, h=45: halfway front/side -> (45*2 + 45*4)/90 = 3
    assert abs(float(pe_i(90, 45)[0]) - 3.0) < 1e-5
    # v=0 collapses to top regardless of h
    assert abs(float(pe_i(0, 123)[0]) - 1.0) < 1e-5
    # h == 0 (and 360) is pure front, NOT the reference's 4*side - 3*front
    # extrapolation (its open-interval piecewise blend misses exact 0)
    assert abs(float(pe_i(90, 0)[0]) - 4.0) < 1e-5
    assert abs(float(pe_i(90, 360)[0]) - 4.0) < 1e-5

    pe_off = PositionalEmbeddings(base, top, side, back, front, mode="off")
    assert float(pe_off(45, 45)[0]) == 0.0


def test_random_train_pose_geometry():
    """Sampler parity with reference random_cameras_datamanager.py:65-151:
    cameras sit at ~radius from center, the -z camera axis points at the
    center, vertical angles stay in range, and rays traced through the
    center pixel hit the center."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuradar_tpu.generative.random_cameras import RandomCamerasConfig, random_train_pose

    cfg = RandomCamerasConfig(resolution=32, radius_mean=2.5, radius_std=0.0,
                              jitter_std=0.0, center=(1.0, -2.0, 0.5))
    cams, vdeg, cdeg = jax.jit(lambda k: random_train_pose(k, 16, cfg))(jax.random.PRNGKey(0))

    center = np.asarray(cfg.center)
    pos = np.asarray(cams.camera_to_worlds[:, :, 3])
    np.testing.assert_allclose(np.linalg.norm(pos - center, axis=-1), 2.5, rtol=1e-5)

    # vertical range (-90, 0) + 90 -> arccos in [0, 90] deg
    assert np.all((np.asarray(vdeg) >= 0) & (np.asarray(vdeg) <= 90.0))
    assert np.all((np.asarray(cdeg) >= 0) & (np.asarray(cdeg) <= 360.0))

    # -z camera axis must look at the center (reference :110 comment)
    minus_z = -np.asarray(cams.camera_to_worlds[:, :, 2])
    to_center = center - pos
    to_center /= np.linalg.norm(to_center, axis=-1, keepdims=True)
    np.testing.assert_allclose(minus_z, to_center, atol=1e-5)

    # a center-pixel ray passes within a pixel's angle of the center
    idx = jnp.arange(16)
    coords = jnp.broadcast_to(jnp.array([[15.5, 15.5]]), (16, 2))
    rb = cams.generate_rays(idx, coords)
    d = np.asarray(rb.directions)
    cosang = np.sum(d * to_center, axis=-1)
    assert np.all(cosang > np.cos(0.05))


def test_random_train_pose_area_uniform_vertical():
    """arccos(1-2u) over the full sphere gives E[cos(theta)] = 0 (area
    uniformity) — a statistical check of the inverse-CDF transform."""
    import jax
    import numpy as np

    from neuradar_tpu.generative.random_cameras import RandomCamerasConfig, random_train_pose

    cfg = RandomCamerasConfig(vertical_rotation_range=(-90.0, 90.0))
    _, vdeg, _ = random_train_pose(jax.random.PRNGKey(1), 4096, cfg)
    mean_cos = float(np.mean(np.cos(np.deg2rad(np.asarray(vdeg)))))
    assert abs(mean_cos) < 0.05
