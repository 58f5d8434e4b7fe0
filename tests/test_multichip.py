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


def test_param_shardings_tensor_parallel():
    """Hash tables (flat 1-D 'hash_table' leaves) shard over the model axis;
    everything else replicates; a sharded gather matches the replicated one."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neuradar_tpu.parallel.sharding import make_mesh_2d, param_shardings, shard_params

    mesh = make_mesh_2d(4, 2)
    params = {
        "field": {"grid": {"hash_table": jnp.arange(1024.0)}, "mlp": {"kernel": jnp.ones((8, 8))}},
        "decoder": {"bias": jnp.zeros((3,))},
    }
    sh = param_shardings(params, mesh)
    assert sh["field"]["grid"]["hash_table"].spec == P("model")
    assert sh["field"]["mlp"]["kernel"].spec == P()
    assert sh["decoder"]["bias"].spec == P()

    placed = shard_params(params, sh)
    idx = jnp.asarray(np.random.RandomState(0).randint(0, 1024, (64,)))
    idx = jax.device_put(idx, NamedSharding(mesh, P()))

    @jax.jit
    def gather(tbl, i):
        return tbl[i].sum()

    got = gather(placed["field"]["grid"]["hash_table"], idx)
    want = np.arange(1024.0)[np.asarray(idx)].sum()
    np.testing.assert_allclose(float(got), want)


def test_shard_batch_layout():
    from neuradar_tpu.parallel.sharding import batch_sharding, make_mesh, shard_batch

    mesh = make_mesh(4)
    import jax.numpy as jnp

    batch = {"a": jnp.zeros((8, 3)), "b": jnp.zeros((16,))}
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert v.sharding.is_equivalent_to(batch_sharding(mesh), v.ndim)
