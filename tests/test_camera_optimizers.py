"""Camera pose optimizers (cf. reference cameras/camera_optimizers.py:42-244
+ tests using NearFarCollider bundles)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.camera_optimizers import (
    CameraOptimizer,
    CameraOptimizerConfig,
    ScaledCameraOptimizerConfig,
)
from neuradar_tpu.cameras.rays import RayBundle


def _bundle(n=4):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)),
        pixel_area=jnp.ones((n, 1)),
        camera_indices=jnp.arange(n, dtype=jnp.int32)[:, None],
    )


def test_off_mode_is_identity():
    opt = CameraOptimizer(config=CameraOptimizerConfig(mode="off"), num_cameras=4)
    rb = _bundle()
    out = opt.apply({}, rb, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out.origins), np.asarray(rb.origins))
    np.testing.assert_allclose(np.asarray(out.directions), np.asarray(rb.directions))


def test_so3xr3_applies_learned_correction():
    opt = CameraOptimizer(config=CameraOptimizerConfig(mode="SO3xR3"), num_cameras=4)
    rb = _bundle()
    params = opt.init(jax.random.PRNGKey(0), rb, method=CameraOptimizer.apply_to_raybundle)
    # zero init: identity correction
    out0 = opt.apply(params, rb, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out0.origins), 0.0, atol=1e-7)
    # set frame 1 to translate +x and rotate 90 deg about z
    adj = params["params"]["pose_adjustment"]
    adj = adj.at[1].set(jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.0, np.pi / 2]))
    params = {"params": {"pose_adjustment": adj}}
    out = opt.apply(params, rb, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out.origins[1]), [0.5, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.origins[0]), 0.0, atol=1e-7)  # others untouched
    # direction (0,0,-1) rotated about z stays (0,0,-1)
    np.testing.assert_allclose(np.asarray(out.directions[1]), [0.0, 0.0, -1.0], atol=1e-6)
    # a direction along +x maps to +y under 90-deg z rotation
    rb_x = rb.replace(directions=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1)))
    out_x = opt.apply(params, rb_x, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out_x.directions[1]), [0.0, 1.0, 0.0], atol=1e-6)

    # regularization grows with the adjustment and is differentiable
    reg0 = float(opt.apply({"params": {"pose_adjustment": jnp.zeros((4, 6))}},
                           method=CameraOptimizer.regularization_loss))
    reg1 = float(opt.apply(params, method=CameraOptimizer.regularization_loss))
    assert reg0 == 0.0 and reg1 > 0.0
    mets = opt.apply(params, method=CameraOptimizer.metrics)
    assert float(mets["camera_opt_translation"]) > 0.0


def test_scaled_optimizer_weights():
    cfg = ScaledCameraOptimizerConfig()
    opt = CameraOptimizer(config=cfg, num_cameras=2)
    rb = _bundle(2)
    params = opt.init(jax.random.PRNGKey(0), rb, method=CameraOptimizer.apply_to_raybundle)
    # unit tangent in z-translation is scaled down by weight 0.01
    adj = jnp.zeros((2, 6)).at[0, 2].set(1.0)
    out = opt.apply({"params": {"pose_adjustment": adj}}, rb, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out.origins[0]), [0.0, 0.0, 0.01], atol=1e-6)
    # per-axis translation penalty tuple is honored
    reg = float(opt.apply({"params": {"pose_adjustment": adj}},
                          method=CameraOptimizer.regularization_loss))
    assert abs(reg - 0.01 * 1e-3 / 6) < 1e-9  # weighted |0.01| * penalty 1e-3, mean over 2x3 entries


def test_regularization_grad_finite_at_zero_adjustment():
    """jnp.linalg.norm's gradient at 0 is NaN — the safe norm must give the
    torch subgradient (0) so the FIRST optimizer step after zero init stays
    finite (regression: nerfacto + SO3xR3 went NaN at step 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuradar_tpu.cameras.camera_optimizers import CameraOptimizer, CameraOptimizerConfig

    opt = CameraOptimizer(config=CameraOptimizerConfig(mode="SO3xR3"), num_cameras=3)
    variables = opt.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))

    def loss(params):
        return opt.apply({"params": params}, method=CameraOptimizer.regularization_loss)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
