"""Scene colliders (cf. reference tests/model_components/test_ray_sampler.py's
NearFarCollider usage and scene_colliders.py:29)."""

import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.model_components.scene_colliders import (
    aabb_box_collider,
    near_far_collider,
    sphere_collider,
)


def _bundle():
    origins = jnp.asarray([[-5.0, 0.0, 0.0], [0.0, -7.0, 0.0], [0.0, 0.0, 9.0]])
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    return RayBundle(origins=origins, directions=dirs, pixel_area=jnp.ones((3, 1)))


def test_near_far_collider():
    rb = near_far_collider(_bundle(), 0.5, 100.0)
    np.testing.assert_allclose(np.asarray(rb.nears), 0.5)
    np.testing.assert_allclose(np.asarray(rb.fars), 100.0)


def test_aabb_box_collider():
    aabb = jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    rb = aabb_box_collider(_bundle(), aabb, near_plane=0.1)
    # ray 0 from x=-5 along +x: enters at t=3, exits at t=7
    np.testing.assert_allclose(float(rb.nears[0, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(rb.fars[0, 0]), 7.0, atol=1e-5)
    np.testing.assert_allclose(float(rb.nears[1, 0]), 5.0, atol=1e-5)
    np.testing.assert_allclose(float(rb.fars[2, 0]), 11.0, atol=1e-5)
    assert (np.asarray(rb.fars) > np.asarray(rb.nears)).all()


def test_sphere_collider():
    rb = sphere_collider(_bundle(), jnp.zeros(3), radius=2.0)
    np.testing.assert_allclose(float(rb.nears[0, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(rb.fars[0, 0]), 7.0, atol=1e-5)
    # origin inside the sphere -> near clamps to 0
    inside = RayBundle(origins=jnp.zeros((1, 3)), directions=jnp.asarray([[1.0, 0.0, 0.0]]),
                       pixel_area=jnp.ones((1, 1)))
    rb2 = sphere_collider(inside, jnp.zeros(3), radius=2.0)
    np.testing.assert_allclose(float(rb2.nears[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(rb2.fars[0, 0]), 2.0, atol=1e-5)
