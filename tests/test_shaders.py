"""Shading helpers (reference model_components/shaders.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.model_components.shaders import lambertian_shade, normals_shade


def test_lambertian_shade_values():
    rgb = jnp.asarray([[1.0, 0.5, 0.25]])
    light = jnp.asarray([0.0, 0.0, 1.0])
    # normal facing the light -> full shading
    shaded, albedo = lambertian_shade(rgb, jnp.asarray([[0.0, 0.0, 1.0]]), light)
    np.testing.assert_allclose(np.asarray(shaded), 1.0)
    np.testing.assert_allclose(np.asarray(albedo), np.asarray(rgb))
    # normal away from the light -> clamped to ambient floor (0 at weight 1)
    shaded, albedo = lambertian_shade(rgb, jnp.asarray([[0.0, 0.0, -1.0]]), light)
    np.testing.assert_allclose(np.asarray(shaded), 0.0)
    # ambient mix: weight 0.25 keeps 0.75 of the color regardless of normals
    shaded, _ = lambertian_shade(rgb, jnp.asarray([[0.0, 0.0, -1.0]]), light, shading_weight=0.25)
    np.testing.assert_allclose(np.asarray(shaded), 0.75)


def test_lambertian_detach_normals_blocks_grad():
    light = jnp.asarray([0.0, 0.0, 1.0])

    def f(n, detach):
        shaded, _ = lambertian_shade(jnp.ones((1, 3)), n, light, detach_normals=detach)
        return shaded.sum()

    n = jnp.asarray([[0.6, 0.0, 0.8]])
    assert float(jnp.abs(jax.grad(lambda x: f(x, True))(n)).sum()) == 0.0
    assert float(jnp.abs(jax.grad(lambda x: f(x, False))(n)).sum()) > 0.0


def test_normals_shade_range_and_weights():
    n = jnp.asarray([[1.0, -1.0, 0.0], [0.0, 0.0, 1.0]])
    out = np.asarray(normals_shade(n))
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_allclose(out[0], [1.0, 0.0, 0.5])
    w = jnp.asarray([[0.5], [0.0]])
    outw = np.asarray(normals_shade(n, w))
    np.testing.assert_allclose(outw[1], 0.0)
    np.testing.assert_allclose(outw[0], out[0] * 0.5)
