"""Data-parallel sharding test: the full train step over a multi-device mesh
(the multi-device coverage the reference lacks, SURVEY.md §4)."""

import jax
import numpy as np


def test_sharded_grad_step_psum():
    """A sharded loss/grad step over the 8-device mesh: XLA must insert the
    gradient all-reduce (the driver's dryrun_multichip covers the full model;
    this keeps CI light on the single-core host)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neuradar_tpu.parallel.sharding import make_mesh

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    w = jax.device_put(jnp.ones((4,)), NamedSharding(mesh, P()))
    x = jax.device_put(jnp.arange(32.0).reshape(8 * 4, 1) * jnp.ones((1, 4)), NamedSharding(mesh, P("data")))

    @jax.jit
    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.grad(loss)(w, x)
    # replicated gradient equals the single-device value
    g_ref = jax.grad(loss)(np.ones(4, np.float32), np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)


def test_shard_batch_layout():
    from neuradar_tpu.parallel.sharding import batch_sharding, make_mesh, shard_batch

    mesh = make_mesh(4)
    import jax.numpy as jnp

    batch = {"a": jnp.zeros((8, 3)), "b": jnp.zeros((16,))}
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert v.sharding.is_equivalent_to(batch_sharding(mesh), v.ndim)
