"""Profiling: wall-time averages per function + JAX device traces.

cf. reference nerfstudio/utils/profiler.py: (1) 'basic' — a @time_function
decorator keeping running averages, printed at exit (profiler.py:53-122);
(2) 'pytorch' — torch.profiler chrome traces around selected steps
(:134-179). Here (2) becomes jax.profiler traces (works for TPU + CPU), and
named scopes annotate the compiled graphs.
"""

from __future__ import annotations

import atexit
import contextlib
import functools
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

_TIMES: Dict[str, list] = defaultdict(lambda: [0.0, 0])
_ENABLED = False


def enable(mode: str = "basic") -> None:
    global _ENABLED
    _ENABLED = mode in ("basic", "jax")


def time_function(fn=None, *, name: Optional[str] = None):
    """Decorator / context manager keeping a running average wall time.

    Forms: ``@time_function``, ``@time_function(name=...)`` (the returned
    _TimeBlock is callable as a decorator), ``with time_function(name=...):``.
    """
    if fn is None:
        return _TimeBlock(name or "block")

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _ENABLED:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        rec = _TIMES[name or fn.__qualname__]
        rec[0] += time.perf_counter() - t0
        rec[1] += 1
        return out

    return wrapper


class _TimeBlock(contextlib.AbstractContextManager):
    def __init__(self, name: str):
        self.name = name

    def __call__(self, fn):
        # @time_function(name=...) decorator-factory form
        return time_function(fn, name=self.name)

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if _ENABLED:
            rec = _TIMES[self.name]
            rec[0] += time.perf_counter() - self.t0
            rec[1] += 1
        return False


def flush_profiler() -> None:
    """Print running averages (cf. profiler.py:119-122)."""
    if not _TIMES:
        return
    print("[profiler] average wall times:")
    for name, (total, count) in sorted(_TIMES.items(), key=lambda kv: -kv[1][0]):
        print(f"  {name}: {total / max(count, 1) * 1e3:.2f} ms x {count}")


atexit.register(flush_profiler)


@contextlib.contextmanager
def device_trace(log_dir: str = "profiles"):
    """jax.profiler trace (chrome/perfetto viewable), the TPU analogue of the
    reference's torch.profiler export (:160-175)."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
