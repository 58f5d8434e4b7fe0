"""Plugin method discovery (cf. reference tests/plugins/test_registry.py:
entry-point + env-var registration of external method configs)."""

import sys
import types

import numpy as np  # noqa: F401


def _fake_method():
    from neuradar_tpu.engine.trainer import TrainerConfig

    cfg = TrainerConfig()
    cfg.method_name = "external-method"
    return cfg


def test_env_var_discovery(monkeypatch):
    from neuradar_tpu.plugins.registry import ENV_VAR, discover_methods

    mod = types.ModuleType("fake_plugin_mod")
    mod.make = _fake_method
    monkeypatch.setitem(sys.modules, "fake_plugin_mod", mod)
    monkeypatch.setenv(ENV_VAR, "external-method=fake_plugin_mod:make")
    methods = discover_methods()
    assert "external-method" in methods
    assert methods["external-method"]().method_name == "external-method"


def test_get_method_falls_through_to_plugins(monkeypatch):
    from neuradar_tpu.configs.method_configs import get_method
    from neuradar_tpu.plugins.registry import ENV_VAR

    mod = types.ModuleType("fake_plugin_mod2")
    mod.make = _fake_method
    monkeypatch.setitem(sys.modules, "fake_plugin_mod2", mod)
    monkeypatch.setenv(ENV_VAR, "external-method=fake_plugin_mod2:make")
    cfg = get_method("external-method")
    assert cfg.method_name == "external-method"


def test_unknown_method_raises(monkeypatch):
    import pytest

    from neuradar_tpu.configs.method_configs import get_method
    from neuradar_tpu.plugins.registry import ENV_VAR

    monkeypatch.setenv(ENV_VAR, "")
    with pytest.raises(KeyError):
        get_method("definitely-not-a-method")


def test_malformed_env_spec_is_skipped(monkeypatch, capsys):
    from neuradar_tpu.plugins.registry import ENV_VAR, discover_methods

    monkeypatch.setenv(ENV_VAR, "bad-spec-no-equals, another=missing.module:fn")
    methods = discover_methods()
    assert "bad-spec-no-equals" not in methods and "another" not in methods
    assert "[plugins]" in capsys.readouterr().out
