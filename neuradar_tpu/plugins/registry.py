"""Plugin discovery for external method configs.

cf. reference nerfstudio/plugins/registry.py:34-79: methods are discovered
from the 'neuradar_tpu.method_configs' entry-point group and from the
NEURADAR_TPU_METHOD_CONFIGS environment variable
("name=module.path:function" comma-separated).
"""

from __future__ import annotations

import importlib
import os
from typing import Callable, Dict

ENTRYPOINT_GROUP = "neuradar_tpu.method_configs"
ENV_VAR = "NEURADAR_TPU_METHOD_CONFIGS"


def discover_methods() -> Dict[str, Callable]:
    methods: Dict[str, Callable] = {}
    try:
        from importlib.metadata import entry_points

        eps = entry_points()
        group = eps.select(group=ENTRYPOINT_GROUP) if hasattr(eps, "select") else eps.get(ENTRYPOINT_GROUP, [])
        for ep in group:
            try:
                methods[ep.name] = ep.load()
            except Exception as e:  # noqa: BLE001
                print(f"[plugins] failed to load entry point {ep.name}: {e}")
    except Exception:  # noqa: BLE001
        pass

    spec = os.environ.get(ENV_VAR, "")
    for item in filter(None, (s.strip() for s in spec.split(","))):
        try:
            name, target = item.split("=", 1)
            module, func = target.split(":", 1)
            methods[name] = getattr(importlib.import_module(module), func)
        except Exception as e:  # noqa: BLE001
            print(f"[plugins] failed to load {item!r} from ${ENV_VAR}: {e}")
    return methods
