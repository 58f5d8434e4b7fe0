"""Multi-host (multi-process) bootstrap + rank utilities.

TPU-native replacement for the reference's DDP launcher + comms helpers
(reference nerfstudio/scripts/train.py:110-231 `_distributed_worker/launch`
— torch.multiprocessing spawn + `dist.init_process_group`; and
nerfstudio/utils/comms.py:21-71 — world_size/rank/is_main_process/
synchronize). On TPU pods there is no per-device process spawn: each HOST
runs one process, `jax.distributed.initialize()` wires the coordinator, and
every jitted computation then sees the GLOBAL device set, so the same
`parallel.sharding` meshes scale from one chip to a pod slice with no other
code change (collectives ride ICI; cross-host over DCN only at mesh edges).

The reference's comms surface maps as:
  get_world_size()     -> jax.process_count() (hosts) / device_count (chips)
  get_rank()           -> jax.process_index()
  is_main_process()    -> is_main_process() below
  synchronize()        -> unnecessary for compute (XLA programs are globally
                          scheduled); sync_hosts() below offers an explicit
                          barrier for host-side effects (checkpoint writes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def setup_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process launch is detected.

    Arguments may come from the CLI; otherwise standard env vars are used
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the cloud TPU
    metadata jax reads natively). Single-process runs (no coordinator
    anywhere) are a no-op — the common case on one host. Returns True iff
    distributed was initialized by this call.

    cf. reference scripts/train.py:167-231 launch(): world_size==1 calls the
    main func directly, >1 spawns workers + init_process_group. Here the
    "spawn" is external (one process per host, e.g. via the TPU VM runtime),
    so this function only performs the init_process_group equivalent.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    env_np = os.environ.get("NUM_PROCESSES")
    env_pid = os.environ.get("PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    if coordinator_address is None and num_processes is None:
        return False  # single-process (or TPU-pod auto-detect handled by jax itself)
    if num_processes == 1 and coordinator_address is None:
        return False  # explicit single-host launch: nothing to wire
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def world_size() -> int:
    """Number of participating HOST processes (reference comms.get_world_size
    counts GPUs; chips here are jax.device_count())."""
    return jax.process_count()


def rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """True on exactly one host — gate checkpoint writes, event logging and
    viewer servers on this (the reference gates the same side effects on
    comms.is_main_process, trainer.py + writer.py)."""
    return jax.process_index() == 0


def sync_hosts(name: str = "sync") -> None:
    """Explicit cross-host barrier for HOST-side effects (e.g. "all hosts
    finished writing their checkpoint shard"). Device computations need no
    barrier — XLA schedules them globally — so this is only for filesystem/
    network side effects, like the reference's comms.synchronize() around
    checkpoint save/load. Implemented as a tiny global psum so it works on
    any backend without extra deps."""
    if jax.process_count() == 1:
        return
    # One global all-reduce, synchronized by FETCHING the value: on the axon
    # relay backend block_until_ready() returns before execution finishes
    # (CLAUDE.md) — only a value fetch is a true barrier on every backend.
    x = jax.numpy.ones((jax.local_device_count(),))
    jax.device_get(jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x))


def local_batch_slice(global_batch_size: int) -> slice:
    """Each host loads only its slice of the global batch (the datamanager
    runs per-host, like the reference's per-process DataLoader under DDP).
    With jax.make_array_from_process_local_data the per-host arrays assemble
    into one globally-sharded batch."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
