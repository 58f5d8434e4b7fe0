"""End-to-end NeuRadar model tests: forward, loss, gradients — the
integration coverage the reference lacks (SURVEY.md §4)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.models.neuradar import (
    NeuRadarModel,
    NeuRadarModelConfig,
    SceneMeta,
    SegmentLayout,
)
from neuradar_tpu.model_components.dynamic_actors import trajectories_from_dicts


def small_config():
    cfg = NeuRadarModelConfig()
    cfg.field.grid.static.log2_hashmap_size = 12
    cfg.field.grid.actor.log2_hashmap_size = 10
    cfg.sampling.proposal_field_1.grid.static.log2_hashmap_size = 11
    cfg.sampling.proposal_field_2.grid.static.log2_hashmap_size = 11
    cfg.sampling.proposal_field_1.grid.actor.log2_hashmap_size = 9
    cfg.sampling.proposal_field_2.grid.actor.log2_hashmap_size = 9
    cfg.sampling.num_proposal_samples = (16, 8)
    cfg.sampling.num_nerf_samples = 6
    cfg.loss.vgg_mult = 0.0  # keep the test light
    return cfg


def make_layout():
    return SegmentLayout(num_cam=2 * 16, num_lidar=16, num_radar_scans=2, rays_per_scan=12, patch_size=(4, 4))


def make_bundle_and_batch(layout, seed=0, n_gt=6):
    rng = np.random.RandomState(seed)
    R = layout.total
    dirs = rng.randn(R, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.zeros((R, 3), np.float32)
    times = rng.uniform(0, 5, (R, 1)).astype(np.float32)

    directions_norm = np.ones((R, 1), np.float32)
    lidar_dist = rng.uniform(5, 50, (layout.num_lidar, 1)).astype(np.float32)
    directions_norm[layout.num_cam : layout.num_cam + layout.num_lidar] = lidar_dist
    did_return = np.ones((R, 1), bool)
    did_return[layout.num_cam + 3 : layout.num_cam + 6] = False

    spher = np.zeros((R, 2), np.float32)
    spher[layout.num_cam + layout.num_lidar :] = rng.uniform(-0.5, 0.5, (layout.num_radar, 2))

    bundle = RayBundle(
        origins=jnp.asarray(origins),
        directions=jnp.asarray(dirs),
        pixel_area=jnp.full((R, 1), 1e-4),
        nears=jnp.zeros((R, 1)),
        fars=jnp.full((R, 1), 100.0),
        times=jnp.asarray(times),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
        metadata={
            "sensor_idxs": jnp.zeros((R, 1), jnp.int32),
            "directions_norm": jnp.asarray(directions_norm),
            "did_return": jnp.asarray(did_return),
            "directions_spher": jnp.asarray(spher),
        },
    )
    u = 3
    ph, pw = layout.patch_size
    batch = {
        "image": jnp.asarray(rng.rand(layout.num_cam // (ph * pw), ph * u, pw * u, 3).astype(np.float32)),
        "lidar_distance": jnp.asarray(lidar_dist),
        "lidar_intensity": jnp.asarray(rng.rand(layout.num_lidar, 1).astype(np.float32)),
        "did_return": jnp.asarray(did_return[layout.num_cam : layout.num_cam + layout.num_lidar]),
        "radar_gt": jnp.asarray(rng.randn(layout.num_radar_scans, n_gt, 3).astype(np.float32) * 10),
        "radar_gt_mask": jnp.asarray(np.array([[True] * n_gt, [True] * 3 + [False] * (n_gt - 3)])),
    }
    return bundle, batch


def make_trajectories(n=2):
    trajs = []
    for a in range(n):
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[:, 0, 3] = 15.0 * (a + 1)
        trajs.append(dict(timestamps=np.array([0.0, 5.0]), poses=poses, dims=np.array([4.0, 2.0, 1.5]),
                          symmetric=False, deformable=False))
    return trajectories_from_dicts(trajs)


RNGS = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
        "flip": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}


@pytest.fixture(scope="module")
def model_and_params(small_model_setup):
    # shared session-scoped init (tests/conftest.py) — suite-trim: this and
    # test_nff_chunking's setup used to run the identical multi-minute init
    model, variables, layout, bundle, batch, _cfg, _scene = small_model_setup
    return model, variables, layout, bundle, batch


def test_forward_shapes(model_and_params):
    model, variables, layout, bundle, batch = model_and_params
    outputs, _ = model.apply(
        variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
        rngs=RNGS, mutable=["batch_stats"],
    )
    assert outputs["rgb"].shape == (2, 12, 12, 3)
    assert outputs["intensity"].shape == (layout.num_lidar, 1)
    assert outputs["ray_drop_logits"].shape == (layout.num_lidar, 1)
    assert outputs["radar_output"].shape == (2, 12, 7)
    assert outputs["depth"].shape == (layout.total, 1)
    assert outputs["accumulation"].shape == (layout.total, 1)
    rgb = np.asarray(outputs["rgb"])
    assert (rgb >= 0).all() and (rgb <= 1).all()
    ep = np.asarray(outputs["radar_output"][..., 0])
    assert (ep >= 0).all() and (ep <= 1).all()
    assert (np.asarray(outputs["radar_output"][..., 4:]) >= 0).all()  # softplus vars


def test_loss_and_metrics(model_and_params):
    model, variables, layout, bundle, batch = model_and_params
    (total, (loss_dict, metrics, _)), _ = model.apply(
        variables, bundle, batch, layout, train=True, method=NeuRadarModel.loss_and_metrics,
        rngs=RNGS, mutable=["batch_stats"],
    )
    assert np.isfinite(float(total))
    for k in ("rgb_loss", "depth_loss", "intensity_loss", "ray_drop_loss", "carving_loss",
              "radar_loss", "interlevel_loss", "distortion_loss", "depth_loss_0", "carving_loss_1"):
        assert k in loss_dict, k
        assert np.isfinite(float(loss_dict[k])), k
    for k in ("psnr", "depth_median_l2", "ray_drop_accuracy", "radar_loss"):
        assert k in metrics, k


def test_gradients_flow(model_and_params):
    model, variables, layout, bundle, batch = model_and_params
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (total, _), _ = model.apply(
            {"params": p, **other}, bundle, batch, layout, train=True,
            method=NeuRadarModel.loss_and_metrics, rngs=RNGS, mutable=["batch_stats"],
        )
        return total

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.abs(g).sum(), grads))
    total_grad = sum(float(x) for x in flat)
    assert np.isfinite(total_grad) and total_grad > 0
    # key parameter groups receive gradient
    def norm_of(subtree):
        return sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(subtree))

    assert norm_of(grads["field"]["hashgrid"]) > 0
    assert norm_of(grads["proposal_field_0"]) > 0
    assert norm_of(grads["rgb_decoder"]) > 0
    assert norm_of(grads["lidar_decoder"]) > 0
    assert norm_of(grads["radar_decoder"]) > 0
    assert norm_of(grads["dynamic_actors"]) >= 0  # may be zero if no samples hit actors


def test_eval_mode_deterministic(model_and_params):
    model, variables, layout, bundle, batch = model_and_params
    out1, _ = model.apply(variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
                          rngs=RNGS, mutable=["batch_stats"])
    out2, _ = model.apply(variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
                          rngs=RNGS, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out1["depth"]), np.asarray(out2["depth"]))
