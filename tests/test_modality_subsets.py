"""Training with modality subsets: camera+lidar only (the 'neurad' method)
and camera-only must build and step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuradar_tpu.data.datamanager import ADDataManagerConfig, build_train_bundle
from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipeline, ADNeuRadarPipelineConfig
from tests.test_trainer_e2e import tiny_outputs


def make_pipeline(num_lidar=128, num_radar_scans=0):
    pipe = ADNeuRadarPipelineConfig(
        datamanager=ADDataManagerConfig(
            num_rgb_patches=2, patch_size=8, num_lidar_rays=num_lidar, num_radar_scans=num_radar_scans,
            max_radar_gt=16,
        )
    )
    m = pipe.model
    m.field.grid.static.log2_hashmap_size = 12
    m.field.grid.actor.log2_hashmap_size = 10
    for pf in (m.sampling.proposal_field_1, m.sampling.proposal_field_2):
        pf.grid.static.log2_hashmap_size = 11
        pf.grid.actor.log2_hashmap_size = 9
    m.sampling.num_proposal_samples = (16, 8)
    m.sampling.num_nerf_samples = 6
    m.loss.vgg_mult = 0.0
    return ADNeuRadarPipeline(pipe, tiny_outputs())


def _step_once(pipeline):
    variables = pipeline.init_variables(0)
    loss_fn = pipeline.make_train_loss_fn()
    batch = jax.tree.map(jnp.asarray, pipeline.datamanager.sample_train_batch())
    total, (loss_dict, metrics, _) = jax.jit(loss_fn)(
        variables["params"], variables.get("batch_stats", {}), batch, jax.random.PRNGKey(0)
    )
    return float(total), loss_dict


def test_neurad_no_radar():
    pipeline = make_pipeline(num_lidar=128, num_radar_scans=0)
    total, loss_dict = _step_once(pipeline)
    assert np.isfinite(total)
    assert "radar_loss" not in loss_dict
    assert "depth_loss" in loss_dict


def test_camera_only():
    pipeline = make_pipeline(num_lidar=0, num_radar_scans=0)
    total, loss_dict = _step_once(pipeline)
    assert np.isfinite(total)
    assert "depth_loss" not in loss_dict and "radar_loss" not in loss_dict
    assert "rgb_loss" in loss_dict


def test_uint8_image_batch_matches_float():
    """GT images ship uint8 (4x less H2D) and are normalized on device: the
    loss must match a pre-normalized float batch exactly."""
    pipeline = make_pipeline(num_lidar=0, num_radar_scans=0)
    variables = pipeline.init_variables(0)
    # jit: eager full-model dispatch is ~5x slower on the 1-core host, and
    # both arms' compiles land in the persistent cache (suite-trim)
    loss_fn = jax.jit(pipeline.make_train_loss_fn())
    batch = pipeline.datamanager.sample_train_batch()
    assert batch["image"].dtype == np.uint8
    b_u8 = jax.tree.map(jnp.asarray, batch)
    b_f32 = dict(b_u8)
    b_f32["image"] = b_u8["image"].astype(jnp.float32) / 255.0
    rng = jax.random.PRNGKey(0)
    t1, (ld1, _, _) = loss_fn(variables["params"], variables.get("batch_stats", {}), b_u8, rng)
    t2, (ld2, _, _) = loss_fn(variables["params"], variables.get("batch_stats", {}), b_f32, rng)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)
    np.testing.assert_allclose(float(ld1["rgb_loss"]), float(ld2["rgb_loss"]), rtol=1e-6)
