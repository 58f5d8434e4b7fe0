"""Engine unit tests: schedulers, optimizer grouping, CLI overrides, writer."""

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.configs.cli import apply_config_dict, parse_overrides, set_by_path
from neuradar_tpu.engine.optimizers import (
    AdamOptimizerConfig,
    build_optimizer,
    default_optimizer_groups,
    label_params,
    param_group_label,
)
from neuradar_tpu.engine.schedulers import (
    CosineDecaySchedulerConfig,
    ExponentialDecaySchedulerConfig,
    MultiStepSchedulerConfig,
)


def test_exponential_decay_schedule():
    sched = ExponentialDecaySchedulerConfig(lr_final=1e-3, max_steps=1000, warmup_steps=100).build(1e-2)
    # warmup starts tiny, reaches lr_init at warmup end, decays to lr_final
    assert float(sched(0)) < 1e-4
    np.testing.assert_allclose(float(sched(100)), 1e-2, rtol=1e-3)
    np.testing.assert_allclose(float(sched(1000)), 1e-3, rtol=1e-3)
    # monotone decay after warmup
    assert float(sched(500)) < float(sched(200))


def test_multistep_schedule():
    sched = MultiStepSchedulerConfig(gamma=0.1, milestones=(10, 20)).build(1.0)
    assert float(sched(5)) == 1.0
    np.testing.assert_allclose(float(sched(15)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.01, rtol=1e-6)


def test_cosine_schedule():
    sched = CosineDecaySchedulerConfig(warm_up_end=10, max_steps=100).build(1.0)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1.0, rtol=1e-5)
    assert float(sched(100)) < 0.1


def test_param_group_labels():
    assert param_group_label(("field", "hashgrid", "static_grid", "hash_table")) == "hashgrids"
    assert param_group_label(("dynamic_actors", "actor_positions")) == "trajectory_opt"
    assert param_group_label(("rgb_decoder", "conv_in", "kernel")) == "cnn"
    assert param_group_label(("radar_decoder", "transformer", "layer_0", "linear1", "kernel")) == "transformer"
    assert param_group_label(("camera_optimizer", "pose_adjustment")) == "camera_opt"
    assert param_group_label(("vgg_loss", "vgg19", "conv0", "kernel")) == "frozen"
    assert param_group_label(("field", "mlp_geo", "hidden_0", "kernel")) == "fields"


def test_optimizer_updates_respect_groups():
    params = {
        "field": {"hashgrid": {"static_grid": {"hash_table": jnp.ones(8)}}},
        "vgg_loss": {"vgg19": {"conv0": {"kernel": jnp.ones(4)}}},
    }
    tx = build_optimizer(params, default_optimizer_groups(100))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen group gets exactly zero updates
    assert float(jnp.abs(updates["vgg_loss"]["vgg19"]["conv0"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["field"]["hashgrid"]["static_grid"]["hash_table"]).sum()) > 0.0


@dataclasses.dataclass
class _Inner:
    lr: float = 0.1
    steps: int = 10
    mode: str = "a"
    shape: tuple = (1, 2)


@dataclasses.dataclass
class _Outer:
    inner: _Inner = dataclasses.field(default_factory=_Inner)
    flag: bool = False
    tri: typing.Optional[bool] = None


def test_cli_overrides():
    cfg = _Outer()
    parse_overrides(cfg, ["--inner.lr", "0.5", "--inner.steps=42", "--flag", "true", "--inner.shape", "3 4 5"])
    assert cfg.inner.lr == 0.5 and cfg.inner.steps == 42 and cfg.flag is True
    assert cfg.inner.shape == (3, 4, 5)


def test_cli_optional_bool_none_sentinel():
    """Optional[bool] tri-state: 'none' restores auto (None), not False —
    the use_pallas_* flags depend on it (None = auto-on for real TPU)."""
    cfg = _Outer()
    parse_overrides(cfg, ["--tri", "false"])
    assert cfg.tri is False
    parse_overrides(cfg, ["--tri", "true"])
    assert cfg.tri is True
    parse_overrides(cfg, ["--tri", "none"])
    assert cfg.tri is None


def test_cli_unknown_field_raises():
    import pytest

    with pytest.raises(AttributeError):
        set_by_path(_Outer(), "inner.nope", "1")


def test_apply_config_dict():
    cfg = _Outer()
    apply_config_dict(cfg, {"inner": {"lr": 0.9, "shape": [7, 8]}, "flag": True, "junk": 1})
    assert cfg.inner.lr == 0.9 and cfg.inner.shape == (7, 8) and cfg.flag is True


def test_writer_jsonl(tmp_path):
    from neuradar_tpu.utils.writer import EventWriter

    w = EventWriter(log_dir=tmp_path, verbose=False)
    w.put_scalars(1, {"loss": 1.0})
    w.put_scalar(2, "psnr", 20.0)
    import json

    lines = [json.loads(l) for l in open(w.log_path)]
    assert lines[0]["loss"] == 1.0 and lines[1]["psnr"] == 20.0


def test_profiler_basic_and_config():
    from neuradar_tpu.engine.trainer import TrainerConfig
    from neuradar_tpu.utils import profiler

    assert TrainerConfig().profiler == "none"
    profiler.enable("basic")
    try:
        @profiler.time_function
        def f(x):
            return x + 1

        assert f(1) == 2
        with profiler.time_function(name="blk"):
            pass

        @profiler.time_function(name="named_fn")
        def g(x):
            return x * 2

        assert g(2) == 4
        assert any("f" in k for k in profiler._TIMES)
        assert "blk" in profiler._TIMES
        assert "named_fn" in profiler._TIMES
    finally:
        profiler._ENABLED = False
        profiler._TIMES.clear()


def test_writer_put_image(tmp_path):
    import numpy as np

    from neuradar_tpu.utils.writer import EventWriter

    w = EventWriter(log_dir=tmp_path, verbose=False)
    w.put_image(12, "eval_rgb", np.random.rand(8, 10, 3))
    w.put_image(13, "eval_rgb", np.zeros((8, 10, 3), np.uint8))
    files = sorted((tmp_path / "images").iterdir())
    assert [f.name for f in files] == ["eval_rgb_000012.png", "eval_rgb_000013.png"]
    assert files[0].read_bytes()[:4] == b"\x89PNG"


def test_metric_tracker_negative_metric_plateau():
    """Tracking -psnr: a plateau (or tiny wobble) must NOT count as
    degradation (regression: multiplicative margin inverted for negatives)."""
    from neuradar_tpu.engine.trainer import MetricTracker, MetricTrackerConfig

    t = MetricTracker(MetricTrackerConfig(margin=0.05, patience=3))
    assert not t.update(-30.0)
    for _ in range(5):
        assert not t.update(-30.0)  # exact plateau
    assert not t.update(-29.5)  # within 5% tolerance of best
    assert t.update(-20.0)  # real degradation (psnr 30 -> 20)
    assert not t.should_stop


def test_adam_lowp_state_matches_f32_when_disabled():
    """state_dtype=None must be exactly optax.scale_by_adam."""
    import optax

    from neuradar_tpu.engine.optimizers import scale_by_adam_lowp_state

    tx_ref = optax.scale_by_adam(eps=1e-15)
    tx_lowp = scale_by_adam_lowp_state(eps=1e-15, state_dtype=None)
    params = {"w": jnp.linspace(-1, 1, 32)}
    s_ref, s_lowp = tx_ref.init(params), tx_lowp.init(params)
    g = {"w": jnp.sin(jnp.arange(32, dtype=jnp.float32))}
    for _ in range(3):
        u_ref, s_ref = tx_ref.update(g, s_ref)
        u_lowp, s_lowp = tx_lowp.update(g, s_lowp)
    np.testing.assert_allclose(np.asarray(u_ref["w"]), np.asarray(u_lowp["w"]), rtol=1e-6)


def test_adam_bf16_moments_track_f32():
    """bf16 moment storage stays within a few % of the f32 update and the
    state is actually stored in bf16 (the HBM point of the transform)."""
    import optax

    from neuradar_tpu.engine.optimizers import scale_by_adam_lowp_state

    tx_ref = optax.scale_by_adam(eps=1e-15)
    tx_bf16 = scale_by_adam_lowp_state(eps=1e-15, state_dtype=jnp.bfloat16)
    params = {"w": jnp.zeros(64)}
    s_ref, s_bf16 = tx_ref.init(params), tx_bf16.init(params)
    assert s_bf16.mu["w"].dtype == jnp.bfloat16 and s_bf16.nu["w"].dtype == jnp.bfloat16
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, k = jax.random.split(key)
        g = {"w": jax.random.normal(k, (64,))}
        u_ref, s_ref = tx_ref.update(g, s_ref)
        u_bf16, s_bf16 = tx_bf16.update(g, s_bf16)
    # updates are ~unit-scale (Adam normalizes); bf16 moments wobble a little
    np.testing.assert_allclose(np.asarray(u_ref["w"]), np.asarray(u_bf16["w"]), atol=0.08)


def test_table_moments_dtype_only_hits_hashgrids():
    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups

    params = {
        "field": {"encoder": {"hash_table": jnp.zeros(128)}, "mlp": {"kernel": jnp.zeros((4, 4))}},
    }
    tx = build_optimizer(params, default_optimizer_groups(1000, table_moments_dtype="bfloat16"))
    state = tx.init(params)
    leaves_bf16 = [x for x in jax.tree.leaves(state) if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    # exactly mu+nu of the one hash_table leaf
    assert len(leaves_bf16) == 2 and all(x.shape == (128,) for x in leaves_bf16)
