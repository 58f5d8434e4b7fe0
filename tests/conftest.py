"""Test configuration: force CPU with 8 virtual devices so unit + sharding
tests run fast and everywhere (cf. SURVEY.md §4 — multi-device coverage the
reference lacks).

Note: this environment may pre-register a remote TPU backend via
sitecustomize, so we both set the env vars and update jax.config post-import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

from neuradar_tpu.utils.cache_dirs import jax_cache_dir  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: re-runs of the suite skip recompilation
jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


@pytest.fixture(scope="session")
def small_model_setup():
    """ONE small NeuRadarModel init shared across test files (suite-trim:
    test_neuradar_model and test_nff_chunking used to build the identical
    model + variables independently — each a multi-minute jitted init on the
    1-core host). Treat everything returned as READ-ONLY.

    Returns (model, variables, layout, bundle, batch, cfg, scene)."""
    import functools

    from neuradar_tpu.models.neuradar import NeuRadarModel, SceneMeta
    from tests.test_neuradar_model import (
        RNGS,
        make_bundle_and_batch,
        make_layout,
        make_trajectories,
        small_config,
    )

    layout = make_layout()
    bundle, batch = make_bundle_and_batch(layout)
    cfg = small_config()
    scene = SceneMeta(static_scale=100.0, duration=5.0, num_sensors=2, num_train_frames=4)
    model = NeuRadarModel(config=cfg, scene=scene, trajectories=make_trajectories())
    # jitted init: ~5x faster than eager op-by-op dispatch on the 1-core CI
    # host, and the compiled program lands in the persistent cache
    init_fn = jax.jit(
        functools.partial(model.init, train=True, method=NeuRadarModel.loss_and_metrics),
        static_argnames=("layout",),
    )
    variables = init_fn(RNGS, bundle, batch, layout=layout)
    return model, variables, layout, bundle, batch, cfg, scene
