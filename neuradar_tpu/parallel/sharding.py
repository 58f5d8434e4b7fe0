"""Data-parallel sharding over the ray axis via jax.sharding.

Replaces the reference's DDP/NCCL stack (scripts/train.py:110-231,
pipelines/base_pipeline.py:305-307, utils/comms.py): instead of one process
per GPU with gradient all-reduce hooks, we annotate the batch's leading
(ray / patch / scan) axes with a 'data' mesh axis and let XLA insert the
psum for gradients — collectives ride ICI automatically. Multi-host runs
call jax.distributed.initialize() and use the same mesh.

The ray workload is embarrassingly parallel until the loss reduction, so pure
DP is the natural mapping (SURVEY.md §5); hash tables stay replicated (they
are the "model" and fit in HBM).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()[: n_devices or jax.device_count()]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading axis (patches / rays / scans) across devices."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(x: Any, sharding: NamedSharding) -> jax.Array:
    """device_put that also works under multi-controller jax.

    Single process: plain jax.device_put. Multi-process (jax.distributed):
    the sharding spans non-addressable devices, so host data must be
    assembled per-shard via make_array_from_callback — every host holds the
    same full value (same-seed sampling / replicated params, mirroring the
    reference where each DDP rank loads identical module state) and each
    process materializes only its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and x.sharding == sharding:
        return x  # already globally placed (e.g. state re-globalized after a step rebuild)
    arr = np.asarray(x)  # raises on non-replicated global arrays — callers re-place only host or replicated data
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def localize_tree(tree: Any) -> Any:
    """Global jax.Arrays -> host-local arrays (multi-controller eval/save).

    The eval and checkpoint paths build host-local inputs (numpy batches,
    full-image ray bundles), which cannot enter a computation together with
    arrays sharded across other processes' devices. The reference solves
    this by construction — every DDP rank holds a full module replica and
    rank 0 evals/saves locally (pipelines/base_pipeline.py:305-307,
    engine/trainer.py @check_main_thread). Equivalent here: fetch a full
    local copy of each leaf. Replicated leaves copy their local shard;
    cross-process-sharded leaves (tensor-parallel hash tables) are
    allgathered — a COLLECTIVE, so under multi-host every process must call
    this function (then typically only rank 0 uses the result).
    """
    def localize(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return x
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_shards[0].data)
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x, tiled=True)

    return jax.tree.map(localize, tree)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard each leaf along axis 0 (leading dim must divide the mesh size —
    the datamanager's batch sizes are chosen accordingly). Every host must
    pass the same GLOBAL batch (same sampling seed across hosts); see
    shard_local_batch for per-host loading."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: global_put(x, sharding), batch)


def shard_local_batch(local_batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Assemble a globally-sharded batch from PER-HOST slices: each process
    loads only its local_batch_slice of the global batch (the multi-host
    analogue of the reference's per-rank DataLoader under DDP) and the
    slices concatenate along axis 0 in process order."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        arr = np.asarray(x)
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        return jax.make_array_from_process_local_data(sharding, arr, global_shape)

    return jax.tree.map(put, local_batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: global_put(x, sharding), tree)


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """(data, model) mesh: rays sharded over 'data', the hash tables —
    the dominant parameter mass — sharded over 'model'. On real hardware lay
    the model axis over the faster ICI ring (jax orders devices accordingly
    under jax.distributed)."""
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def param_shardings(params: Any, mesh: Mesh, table_key: str = "hash_table", axis_name: str = "model") -> Any:
    """Tensor-parallel placement: flat hash tables (1-D, named `hash_table`,
    see field_components/encodings.py:230) are sharded across the model axis
    — XLA turns the combined feature gather into per-shard gathers + an
    all-to-all over ICI; every other parameter is replicated. Works for any
    params-shaped tree (adam moments included) because placement is decided
    by the path name + divisibility."""
    n_model = mesh.shape[axis_name]

    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if (
            any(table_key in str(n) for n in names)
            and getattr(leaf, "ndim", 0) == 1
            and leaf.shape[0] % n_model == 0
        ):
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(place, params)


def shard_params(params: Any, shardings: Any) -> Any:
    return jax.tree.map(global_put, params, shardings)


def multichip_train_step_tp(train_step_fn, mesh: Mesh, params: Any, opt_state: Any):
    """jit a (params, opt_state, batch_stats, batch, rng) step over a 2-D
    (data, model) mesh: batch sharded on 'data', hash tables on 'model'
    (param_shardings), everything else replicated. XLA inserts the psum for
    data-parallel gradients and the table gathers' collectives."""
    p_shard = param_shardings(params, mesh)
    o_shard = param_shardings(opt_state, mesh)
    rep = replicated(mesh)
    batch_s = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step_fn,
        in_shardings=(p_shard, o_shard, rep, batch_s, rep),
        out_shardings=(p_shard, o_shard, rep, rep, rep, rep),
    )


def multichip_train_step(train_step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a (params, opt_state, batch_stats, batch, rng) step with
    replicated-state / sharded-batch in_shardings. XLA propagates the ray
    sharding through ray-gen, sampling and field eval, and inserts the
    gradient all-reduce at the loss mean."""
    state_s = replicated(mesh)
    batch_s = batch_sharding(mesh, axis_name)
    return jax.jit(
        train_step_fn,
        in_shardings=(state_s, state_s, state_s, batch_s, state_s),
        out_shardings=(state_s, state_s, state_s, state_s, state_s, state_s),
    )
