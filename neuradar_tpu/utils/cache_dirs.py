"""Repo-relative JAX persistent-compile-cache locations.

Every entrypoint (bench.py, tools/*, tests/conftest.py, __graft_entry__.py,
validate_learning.py) shares these so a clone at any path caches inside its
own tree instead of a hardcoded /root/repo (ADVICE r3). Import cost is just
this module + the package __init__ (docstring only) — safe before jax.
"""

from __future__ import annotations

import os

# this file lives at <repo>/neuradar_tpu/utils/cache_dirs.py
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jax_cache_dir(platform: str) -> str:
    """Persistent compile-cache dir for 'cpu' (tests/tools) or 'tpu' (bench)."""
    return os.path.join(REPO_ROOT, ".jax_cache", platform)
