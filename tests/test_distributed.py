"""Multi-host bootstrap helpers (parallel/distributed.py) on a single host.

The real multi-host path needs >1 process; here we verify the single-process
semantics the trainer relies on: no-op init, rank/world-size surface, the
barrier degenerating safely, and batch slicing (cf. reference
utils/comms.py:21-71 whose helpers likewise degrade to rank-0 semantics when
dist is unavailable)."""

import os

import numpy as np

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
