"""Pallas kernel correctness vs the XLA reference formulation (interpreter
mode — CI runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.rays import render_weights_from_alpha
from neuradar_tpu.ops.volumetric import fused_composite


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
