"""Data-parallel sharding test: the full train step over a multi-device mesh
(the multi-device coverage the reference lacks, SURVEY.md §4)."""

import jax
import numpy as np


def test_dryrun_multichip_2dev():
    assert jax.device_count() >= 2
    import __graft_entry__ as graft

    graft.dryrun_multichip(2)


def test_shard_batch_layout():
    from neuradar_tpu.parallel.sharding import batch_sharding, make_mesh, shard_batch

    mesh = make_mesh(4)
    import jax.numpy as jnp

    batch = {"a": jnp.zeros((8, 3)), "b": jnp.zeros((16,))}
    sharded = shard_batch(batch, mesh)
    for v in sharded.values():
        assert v.sharding.is_equivalent_to(batch_sharding(mesh), v.ndim)
