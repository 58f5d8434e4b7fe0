"""Multi-host bootstrap helpers (parallel/distributed.py).

Single-process semantics the trainer relies on (no-op init, rank surface,
barrier degeneration, batch slicing — cf. reference utils/comms.py:21-71
whose helpers likewise degrade to rank-0 semantics when dist is
unavailable), plus a REAL 2-process multi-controller run over localhost:
the CI analogue of one process per TPU host (reference scripts/train.py's
mp.spawn + init_process_group), exercising setup_distributed, global
meshes, cross-process batch assembly and the gradient all-reduce."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from neuradar_tpu.parallel import distributed as dist


def test_setup_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    assert dist.setup_distributed() is False


def test_rank_surface_single_process():
    assert dist.world_size() == 1
    assert dist.rank() == 0
    assert dist.is_main_process() is True


def test_sync_hosts_single_process_returns():
    dist.sync_hosts()  # must not hang or require >1 process


def test_local_batch_slice_covers_batch():
    s = dist.local_batch_slice(128)
    assert (s.start, s.stop) == (0, 128)
    x = np.arange(128)
    assert len(x[s]) == 128


def _run_multihost(tmp_path, extra_args=(), timeout=420):
    """Spawn 2 real jax.distributed processes (2 virtual CPU devices each)
    running tests/multihost_worker.py and return their result blobs."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the worker forces cpu via jax.config
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
    # the worker script lives in tests/ (python puts THAT on sys.path, not
    # the repo root); never clobber an existing PYTHONPATH — this image's
    # sitecustomize lives there (CLAUDE.md)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + (os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--coordinator", coordinator,
             "--num-processes", "2", "--process-id", str(i), "--out", str(outs[i]),
             *extra_args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(f"multihost worker {i} timed out")
        assert p.returncode == 0, f"worker {i} failed:\n{stderr[-3000:]}"
        results.append(json.loads(outs[i].read_text()))
    return results



@pytest.fixture(scope="module")
def multihost_results(tmp_path_factory):
    """ONE 2-process launch shared by both multihost tests (suite-trim,
    VERDICT r4 item 8): the --trainer worker runs the plain distributed
    surface AND the trainer path, so the separate plain launch — a second
    full spawn + jax.distributed init + compile — added nothing."""
    return _run_multihost(tmp_path_factory.mktemp("mh"), extra_args=["--trainer"], timeout=900)


def test_two_process_multihost(multihost_results):
    """Real 2-process multi-controller run: global mesh of 4 devices,
    shard_batch / shard_local_batch cross-process assembly, the gradient
    all-reduce, dp x tp param placement, and the host barrier."""
    results = multihost_results
    for i, r in enumerate(results):
        assert r["initialized"] is True
        assert r["world_size"] == 2 and r["rank"] == i
        assert r["is_main"] is (i == 0)
        assert r["local_devices"] == 2 and r["global_devices"] == 4
        assert r["mesh_size"] == 4
        assert r["shard_batch_sum"] == 28.0  # sum(arange(8))
        assert r["local_slice"] == [4 * i, 4 * i + 4]
        assert r["local_batch_shape"] == [8]  # global, assembled from slices
        assert r["shard_local_batch_sum"] == 280.0  # sum(arange(8) * 10)
        assert r["grad_w"] == 3.5  # mean(arange(8)) via cross-process psum
        assert r["table_sum"] == 120.0  # sum(arange(16))
        assert r["table_shard_len"] == 8  # tp=2: half the table per device
        assert r["synced"] is True


def test_two_process_trainer(multihost_results):
    """The full Trainer data-parallel path across PROCESSES: a tiny NeuRadar
    config trains 2 steps over a 2-process x 2-device mesh, with batches
    assembled as global arrays (trainer._device_batch) and the gradient
    all-reduce spanning both processes. Both ranks must agree on the loss."""
    results = multihost_results
    losses = [r["trainer_loss"] for r in results]
    for r in results:
        assert r["trainer_multihost"] is True
        assert np.isfinite(r["trainer_loss"])
        assert r["eval_vars_local"] is True  # eval paths get host-local state
    assert losses[0] == losses[1]  # replicated outputs agree across ranks
    # rank 0 writes events; rank 1's writer is quiet
    by_rank = sorted(results, key=lambda r: r["rank"])
    assert by_rank[0]["writer_active"] is True
    assert by_rank[1]["writer_active"] is False
