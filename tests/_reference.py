"""Import the ACTUAL /root/reference nerfstudio modules for numeric parity.

The reference's pure-torch fallback runs in this image (torch CPU is
installed); only a handful of unavailable extras block the import chain.
This helper installs minimal stubs for those (none of the stubbed symbols
are exercised by the code paths the parity tests call) and appends the
reference tree to sys.path.

Used by tests/test_reference_parity.py — the suite that checks our JAX
re-implementations against the executed reference code rather than against
re-derivations of it (VERDICT r3 item 2).
"""

from __future__ import annotations

import importlib
import sys
import types
import typing

REF_PATH = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


_installed = False


def install() -> None:
    """Idempotently add /root/reference + dependency stubs to sys.modules."""
    global _installed
    if _installed:
        return
    if REF_PATH not in sys.path:
        # append (not insert) so the repo's own packages always win lookups
        sys.path.append(REF_PATH)

    if "viser" not in sys.modules:
        viser = _stub("viser")

        class _SO3:  # scene_box.py:123 calls this at runtime only
            @staticmethod
            def from_rpy_radians(*_a, **_k):
                raise NotImplementedError("viser stub")

        viser.transforms = _stub("viser.transforms", SO3=_SO3)
    if "nerfacc" not in sys.modules:
        # ray_samplers.py:25 imports the class; VolumetricSampler (unused
        # in parity targets) is the only consumer
        _stub("nerfacc", OccGridEstimator=type("OccGridEstimator", (), {}))
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.models = _stub("torchvision.models")
    if "plotly" not in sys.modules:
        go = _stub("plotly.graph_objects")
        _stub("plotly").graph_objects = go
    if "git" not in sys.modules:
        # radar_utils.py:20 does `from git import Optional` (an upstream
        # typo for typing.Optional — gitpython re-exports typing names)
        _stub("git", Optional=typing.Optional)
    _installed = True


def ref(modname: str) -> types.ModuleType:
    """Import a reference module, e.g. ref("nerfstudio.cameras.rays")."""
    install()
    return importlib.import_module(modname)
