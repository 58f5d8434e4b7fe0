"""Pallas kernel correctness vs the XLA reference formulation (interpreter
mode — CI runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.rays import render_weights_from_alpha
from neuradar_tpu.ops.volumetric import fused_composite, fused_composite_sky


def _xla_composite_sky(alpha, feats):
    """The model's XLA formulation (models/neuradar._nff_core)."""
    w = render_weights_from_alpha(alpha)
    accum = jnp.sum(w, axis=-1, keepdims=True)
    w_sky = jnp.concatenate([w[..., :-1], w[..., -1:] + 1 - accum], axis=-1)
    features = jnp.sum(w_sky[..., None] * feats, axis=-2)
    return w_sky, features, accum


def test_fused_composite_sky_forward_matches_model():
    R, S, C = 256, 25, 40
    alpha = jax.random.uniform(jax.random.PRNGKey(0), (R, S), minval=0.0, maxval=0.9)
    feats = jax.random.normal(jax.random.PRNGKey(1), (R, S, C))
    w_p, f_p, a_p = fused_composite_sky(alpha, feats, True)
    w_ref, f_ref, a_ref = _xla_composite_sky(alpha, feats)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_ref), rtol=1e-5, atol=1e-6)


def test_fused_composite_sky_grads_match_model():
    """Custom-VJP backward kernel vs autodiff through the XLA formulation,
    on a loss touching all three outputs."""
    R, S, C = 128, 17, 24
    alpha = jax.random.uniform(jax.random.PRNGKey(2), (R, S), minval=0.05, maxval=0.85)
    feats = jax.random.normal(jax.random.PRNGKey(3), (R, S, C))
    coef = jax.random.normal(jax.random.PRNGKey(4), (R, C))

    def loss_pallas(a, f):
        w, feat, acc = fused_composite_sky(a, f, True)
        return jnp.sum(feat * coef) + jnp.sum(jnp.sin(w)) + jnp.sum(acc**2)

    def loss_xla(a, f):
        w, feat, acc = _xla_composite_sky(a, f)
        return jnp.sum(feat * coef) + jnp.sum(jnp.sin(w)) + jnp.sum(acc**2)

    ga_p, gf_p = jax.grad(loss_pallas, argnums=(0, 1))(alpha, feats)
    ga_x, gf_x = jax.grad(loss_xla, argnums=(0, 1))(alpha, feats)
    # suffix-sum accumulation order differs from autodiff's: float32 noise
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_x), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x), rtol=1e-4, atol=3e-5)


def test_model_flag_use_pallas_composite():
    """The flagged model path produces the same loss/grads as the default
    XLA path (interpret-mode kernel on CPU)."""
    import __graft_entry__

    pipe = __graft_entry__._tiny_pipeline()
    variables = pipe.init_variables(0)
    batch = jax.tree.map(jnp.asarray, pipe.datamanager.sample_train_batch())
    # jit both arms: eager full-model dispatch is ~5x slower on the 1-core
    # host and the compiles land in the persistent cache (suite-trim)
    loss_fn = jax.jit(pipe.make_train_loss_fn())
    rng = jax.random.PRNGKey(0)
    total_xla, _ = loss_fn(variables["params"], variables.get("batch_stats", {}), batch, rng)

    pipe.config.model.use_pallas_composite = True
    loss_fn_p = jax.jit(pipe.make_train_loss_fn())
    total_pal, _ = loss_fn_p(variables["params"], variables.get("batch_stats", {}), batch, rng)
    np.testing.assert_allclose(float(total_pal), float(total_xla), rtol=5e-4)


def test_fused_composite_matches_xla():
    R, S, C = 256, 32, 48
    key = jax.random.PRNGKey(0)
    alpha = jax.random.uniform(key, (R, S), minval=0.0, maxval=0.9)
    feats = jax.random.normal(jax.random.PRNGKey(1), (R, S, C))
    steps = jnp.cumsum(jax.random.uniform(jax.random.PRNGKey(2), (R, S)), axis=-1)

    w_p, f_p, d_p, a_p = fused_composite(alpha, feats, steps, interpret=True)

    w_ref = render_weights_from_alpha(alpha)
    f_ref = jnp.einsum("rs,rsc->rc", w_ref, feats)
    d_ref = jnp.sum(w_ref * steps, axis=-1, keepdims=True)
    a_ref = jnp.sum(w_ref, axis=-1, keepdims=True)

    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_ref), rtol=1e-5, atol=1e-6)
