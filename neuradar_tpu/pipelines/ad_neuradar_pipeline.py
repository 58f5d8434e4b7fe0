"""AD NeuRadar pipeline: binds datamanager + model + eval loops.

cf. reference nerfstudio/pipelines/ad_neuradar_pipeline.py (and ad_pipeline /
base_pipeline). The pipeline owns the jitted train/eval step functions; data
parallelism over the ray axis is a sharding annotation on the batch (see
neuradar_tpu/parallel/sharding.py), not a DDP wrapper
(cf. base_pipeline.py:305-307).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.cameras import generate_camera_rays
from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.data.datamanager import (
    ADDataManager,
    ADDataManagerConfig,
    build_train_bundle,
    merge_modality_bundles,
)
from neuradar_tpu.data.dataparsers.base import DataparserOutputs
from neuradar_tpu.field_components.encodings import cast_hash_tables
from neuradar_tpu.model_components import radar_utils
from neuradar_tpu.model_components.dynamic_actors import trajectories_from_dicts
from neuradar_tpu.model_components.gospa import calculate_gospa
from neuradar_tpu.models.neuradar import NeuRadarModel, NeuRadarModelConfig, SceneMeta, SegmentLayout

RNG_STREAMS = ("sampling", "flip", "dropout")


@dataclass
class ADNeuRadarPipelineConfig:
    """cf. ADNeuRadarPipelineConfig (ad_neuradar_pipeline.py:30-41)."""

    datamanager: ADDataManagerConfig = dataclass_field(default_factory=ADDataManagerConfig)
    model: NeuRadarModelConfig = dataclass_field(default_factory=NeuRadarModelConfig)
    calc_fid_steps: Tuple[int, ...] = (99999999,)
    radar_sampling_rounds: int = 10


class ADNeuRadarPipeline:
    """Owns model + datamanager and the pure step functions."""

    def __init__(self, config: ADNeuRadarPipelineConfig, outputs: DataparserOutputs):
        self.config = config
        self.outputs = outputs
        self.datamanager = ADDataManager(
            outputs, config.datamanager, rgb_upsample_factor=config.model.rgb_upsample_factor
        )
        self.layout = self.datamanager.layout
        scene = SceneMeta(
            static_scale=float(np.abs(outputs.scene_box.aabb).max()),
            duration=float(outputs.duration),
            num_sensors=len(outputs.sensor_idx_to_name),
            num_train_frames=int(
                len(outputs.camera_to_worlds)
                + len(outputs.lidar_to_worlds)
                + len(outputs.radar_to_worlds)
            ),
        )
        self.model = NeuRadarModel(
            config=config.model,
            scene=scene,
            trajectories=trajectories_from_dicts(outputs.trajectories),
        )

    # -- init ------------------------------------------------------------------

    def init_variables(self, seed: int = 0):
        """Initialize parameters on a MINIMAL layout — parameter shapes do not
        depend on batch sizes, so init avoids compiling the full-scale graph."""
        batch = self.datamanager.sample_train_batch()
        layout = self.layout
        tiny = SegmentLayout(
            num_cam=min(layout.num_cam, layout.patch_size[0] * layout.patch_size[1]),
            num_lidar=min(layout.num_lidar, 8),
            num_radar_scans=min(layout.num_radar_scans, 1),
            rays_per_scan=layout.rays_per_scan,
            patch_size=layout.patch_size,
        )
        n_patches = max(tiny.num_cam // (layout.patch_size[0] * layout.patch_size[1]), 1)
        tiny_batch = {
            "cam_frame_idx": batch["cam_frame_idx"][:n_patches],
            "patch_tl": batch["patch_tl"][:n_patches],
            "image": batch["image"][:n_patches],
            "lidar_scan_idx": batch["lidar_scan_idx"][: tiny.num_lidar],
            "lidar_points": batch["lidar_points"][: tiny.num_lidar],
            "lidar_distance": batch["lidar_distance"][: tiny.num_lidar],
            "lidar_intensity": batch["lidar_intensity"][: tiny.num_lidar],
            "did_return": batch["did_return"][: tiny.num_lidar],
            "radar_scan_idx": batch["radar_scan_idx"][: tiny.num_radar_scans],
            "radar_gt": batch["radar_gt"][: tiny.num_radar_scans],
            "radar_gt_mask": batch["radar_gt_mask"][: tiny.num_radar_scans],
        }
        tiny_batch = jax.tree.map(jnp.asarray, tiny_batch)
        bundle = build_train_bundle(
            self.datamanager.tables, tiny_batch, tiny, self.config.model.rgb_upsample_factor
        )
        rngs = {name: jax.random.PRNGKey(seed + i) for i, name in enumerate(("params",) + RNG_STREAMS)}
        init_fn = jax.jit(
            functools.partial(self.model.init, train=True, method=NeuRadarModel.loss_and_metrics),
            static_argnames=("layout",),
        )
        return init_fn(rngs, bundle, tiny_batch, layout=tiny)

    def _hoisted_table_dtype(self):
        """compute_dtype when the once-per-step table cast is enabled
        (models/neuradar.py hoist_table_cast), else None."""
        m = self.config.model
        if m.hoist_table_cast and m.compute_dtype != "float32":
            return jnp.dtype(m.compute_dtype)
        return None

    def _cast_variables(self, variables):
        """Hoisted table cast for eval-path variables (inside jit)."""
        cast_dtype = self._hoisted_table_dtype()
        if cast_dtype is None:
            return variables
        return {**variables, "params": cast_hash_tables(variables["params"], cast_dtype)}

    # -- train step ---------------------------------------------------------------

    def make_train_loss_fn(self):
        """Returns loss_fn(params, batch_stats, host_batch, rng) suitable for
        jax.value_and_grad inside the trainer's jitted step."""
        model = self.model
        layout = self.layout
        tables = self.datamanager.tables
        u = self.config.model.rgb_upsample_factor
        cast_dtype = self._hoisted_table_dtype()

        def loss_fn(params, batch_stats, batch, rng):
            if cast_dtype is not None:
                # one cast per step, outside the nff_chunks scan — the
                # in-module astype becomes a no-op (encodings.cast_hash_tables)
                params = cast_hash_tables(params, cast_dtype)
            bundle = build_train_bundle(tables, batch, layout, u)
            rngs = {name: jax.random.fold_in(rng, i) for i, name in enumerate(RNG_STREAMS)}
            (total, (loss_dict, metrics, _outputs)), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                bundle,
                batch,
                layout,
                train=True,
                method=NeuRadarModel.loss_and_metrics,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return total, (loss_dict, metrics, mutated.get("batch_stats", batch_stats))

        return loss_fn

    def make_eval_loss_fn(self):
        """Eval-split loss/metrics (cf. get_eval_loss_dict,
        ad_neuradar_pipeline.py:87): same graph, train=False, no updates."""
        model = self.model
        layout = self.layout
        tables = self.datamanager.tables
        u = self.config.model.rgb_upsample_factor

        @jax.jit
        def eval_loss(variables, batch):
            variables = self._cast_variables(variables)
            bundle = build_train_bundle(tables, batch, layout, u)
            total, (loss_dict, metrics, _outputs) = model.apply(
                variables, bundle, batch, layout, train=False, method=NeuRadarModel.loss_and_metrics
            )
            return total, loss_dict, metrics

        return eval_loss

    # -- eval ------------------------------------------------------------------

    @functools.cached_property
    def _eval_nff_chunk(self):
        """Jitted whole-bundle eval forward (small bundles: radar/lidar)."""
        model = self.model

        @functools.partial(jax.jit, static_argnames=("layout",))
        def run(variables, bundle, layout, actor_edits=None):
            outputs = model.apply(
                self._cast_variables(variables), bundle, layout, False, actor_edits,
                method=NeuRadarModel.get_outputs,
            )
            return outputs

        return run

    @functools.cached_property
    def _eval_nff_features(self):
        """Jitted NFF-only forward for one ray chunk (camera rays)."""
        model = self.model

        @functools.partial(jax.jit, static_argnames=("layout",))
        def run(variables, bundle, layout, actor_edits=None):
            out = model.apply(self._cast_variables(variables), bundle, layout, False, actor_edits,
                              method=NeuRadarModel.get_nff_outputs)
            return {"features": out["features"], "depth": out["depth"], "accumulation": out["accumulation"]}

        return run

    @functools.cached_property
    def _eval_decode_rgb(self):
        model = self.model

        @functools.partial(jax.jit, static_argnames=("patch_size",))
        def run(variables, features, patch_size):
            return model.apply(variables, features, patch_size, method=NeuRadarModel.decode_camera_features)

        return run

    def render_camera(
        self, variables, cam_idx: int, actor_edits=None, origin_shift=None
    ) -> Dict[str, np.ndarray]:
        """Full-image render with NFF chunking at eval_num_rays_per_chunk
        (cf. get_outputs_for_camera_ray_bundle, models/neuradar.py:905-969).
        With compensate_upsampling_when_rendering (default) rays are shot at
        1/upsample resolution and the CNN upsamples to the target size
        (reference :922-926); with it off, every pixel gets a ray and the
        CNN's u-times output is average-pooled back to the image size.
        actor_edits shifts/removes actors for simulation renders.
        origin_shift [3] adds a world-space offset to every ray origin (the
        shifted-view FID evals, cf. ad_pipeline.py:328-340)."""
        out = self.outputs
        u = self.config.model.rgb_upsample_factor
        H, W = out.image_size
        compensate = self.config.model.compensate_upsampling_when_rendering
        if compensate:
            h, w = H // u, W // u
            rows = np.arange(h) * u + u // 2
            cols = np.arange(w) * u + u // 2
        else:
            h, w = H // u * u, W // u * u  # CNN needs u-divisible patches
            rows = np.arange(h)
            cols = np.arange(w)
        rr, cc = np.meshgrid(rows, cols, indexing="ij")
        coords_np = np.stack([rr.reshape(-1), cc.reshape(-1)], axis=1)
        n_rays = len(coords_np)
        chunk = min(self.config.model.eval_num_rays_per_chunk, n_rays)
        n_pad = (-n_rays) % chunk
        if n_pad:
            coords_np = np.concatenate([coords_np, np.repeat(coords_np[-1:], n_pad, axis=0)])
        layout = SegmentLayout(num_cam=chunk, patch_size=(h, w))

        # dispatch ALL chunks before fetching any result: np.asarray is the
        # only sync point, so device execution overlaps with host dispatch
        # (one host<->device round trip total instead of one per chunk)
        outs = []
        for i in range(0, len(coords_np), chunk):
            coords = jnp.asarray(coords_np[i : i + chunk])
            cam_ids = jnp.full((chunk,), cam_idx, jnp.int32)
            bundle = generate_camera_rays(self.datamanager.tables.cameras, cam_ids, coords)
            if origin_shift is not None:
                bundle = bundle.replace(origins=bundle.origins + jnp.asarray(origin_shift, jnp.float32))
            bundle = merge_modality_bundles(bundle, None, None)
            outs.append(self._eval_nff_features(variables, bundle, layout, actor_edits))
        features = np.concatenate([np.asarray(o["features"]) for o in outs])[:n_rays]
        depth = np.concatenate([np.asarray(o["depth"]) for o in outs])[:n_rays]
        acc = np.concatenate([np.asarray(o["accumulation"]) for o in outs])[:n_rays]

        rgb = np.asarray(self._eval_decode_rgb(variables, jnp.asarray(features), (h, w))[0])
        if not compensate:
            # CNN output is u x the (already full-res) ray grid: average-pool
            # back to image resolution (anti-aliased full-res render)
            rgb = rgb.reshape(h, u, w, u, 3).mean(axis=(1, 3)) if u > 1 else rgb
        return {
            "rgb": rgb,
            "depth": depth.reshape(h, w),
            "accumulation": acc.reshape(h, w),
        }

    def viewer_intrinsics(self, hw: Tuple[int, int]) -> Tuple[float, float, float, float]:
        """(fx, fy, cx, cy) for a free-pose render at resolution hw: the
        scene's first camera focal scaled to the requested width, principal
        point centered (shared by render_pose and the viewer overlays)."""
        base_fx = float(self.outputs.intrinsics[0, 0])
        base_w = float(self.outputs.image_size[1])
        fx = base_fx * hw[1] / base_w
        return fx, fx, hw[1] / 2.0, hw[0] / 2.0

    def render_pose(
        self, variables, c2w: np.ndarray, hw: Tuple[int, int] = (96, 156), actor_edits=None,
        time_s: float = 0.0, output: str = "rgb", camera_type: int = 1,
    ) -> np.ndarray:
        """Render an arbitrary camera pose (viewer path): c2w [3, 4] ->
        uint8 [hw[0], hw[1], 3]. Uses the scene's first camera intrinsics
        scaled to the requested resolution. actor_edits shifts/removes
        dynamic actors (viewer actor controls); time_s places dynamic actors
        at a scene timestamp (closed-loop renders). `output` selects the
        rendered quantity (cf. the reference viewer control panel's output
        selector): "rgb" (CNN-decoded), "depth" (colormapped, acc-faded) or
        "accumulation"."""
        from neuradar_tpu.cameras.cameras import Cameras

        u = self.config.model.rgb_upsample_factor
        H, W = hw[0] // u * u, hw[1] // u * u
        h, w = H // u, W // u
        fx, _, _, _ = self.viewer_intrinsics((H, W))
        if camera_type != 1:
            # angular types (equirect / ODS / VR180): unit coord
            # (col - cx) / fx must span [-1, 1] across the width so the
            # direction formulas cover their full azimuth range
            # (cameras.CameraType) — fx = W/2
            fx = W / 2.0
        cam = Cameras(
            camera_to_worlds=jnp.asarray(c2w, jnp.float32)[None],
            fx=jnp.asarray([[fx]]),
            fy=jnp.asarray([[fx]]),
            cx=jnp.asarray([[W / 2]]),
            cy=jnp.asarray([[H / 2]]),
            width=jnp.asarray([[W]], jnp.int32),
            height=jnp.asarray([[H]], jnp.int32),
            camera_type=jnp.asarray([[camera_type]], jnp.int32),
            times=jnp.full((1, 1), time_s, jnp.float32),
            metadata={"sensor_idxs": jnp.zeros((1, 1), jnp.int32)},
        )
        rows = np.arange(h) * u + u // 2
        cols = np.arange(w) * u + u // 2
        rr, cc = np.meshgrid(rows, cols, indexing="ij")
        coords = jnp.asarray(np.stack([rr.reshape(-1), cc.reshape(-1)], axis=1))
        bundle = generate_camera_rays(cam, jnp.zeros((h * w,), jnp.int32), coords)
        bundle = merge_modality_bundles(bundle, None, None)
        layout = SegmentLayout(num_cam=h * w, patch_size=(h, w))
        o = self._eval_nff_features(variables, bundle, layout, actor_edits)
        if output != "rgb":
            from neuradar_tpu.utils.colormaps import apply_depth_colormap, apply_float_colormap

            acc = np.asarray(o["accumulation"], np.float64).reshape(h, w, 1)
            if output == "depth":
                img = apply_depth_colormap(np.asarray(o["depth"]).reshape(h, w, 1), accumulation=acc)
            elif output == "accumulation":
                img = apply_float_colormap(np.clip(acc, 0, 1))
            else:
                raise ValueError(f"unknown render output {output!r}")
            return (np.clip(img, 0, 1) * 255).astype(np.uint8)
        rgb = self._eval_decode_rgb(variables, o["features"], (h, w))
        return (np.clip(np.asarray(rgb[0]), 0, 1) * 255).astype(np.uint8)

    def _render_radar_deferred(self, variables, scan_idx: int, actor_edits=None) -> jax.Array:
        """Dispatch one radar scan render; returns the DEVICE array [1, n_mb, 7]
        (callers fetch with np.asarray — the sync point)."""
        tables = self.datamanager.tables
        bundle = tables.radars.generate_rays(jnp.asarray([scan_idx], jnp.int32))
        layout = SegmentLayout(num_radar_scans=1, rays_per_scan=int(tables.radars.rays_per_scan))
        bundle = merge_modality_bundles(None, None, bundle)
        outputs = self._eval_nff_chunk(variables, bundle, layout, actor_edits)
        return outputs["radar_output"]

    def render_radar(self, variables, scan_idx: int, actor_edits=None) -> Dict[str, np.ndarray]:
        """Render one radar scan -> multi-Bernoulli output [n_mb, 7]."""
        return {"radar_output": np.asarray(self._render_radar_deferred(variables, scan_idx, actor_edits)[0])}

    def radar_points_world(
        self, variables, time_s: float = 0.0, threshold: float = 0.5, actor_edits=None
    ) -> np.ndarray:
        """Predicted radar detections as WORLD points for the scan nearest
        time_s (viewer radar overlay; cf. the reference viewer's radar point
        clouds). Deterministic euclidean sampling: keep MB means with
        existence probability > threshold. Returns [K, 3] float32 (K may be
        0); empty when the scene has no radar."""
        from neuradar_tpu.model_components.radar_utils import sample_radar_points

        out = self.outputs
        if out.radar_to_worlds is None or not len(out.radar_to_worlds):
            return np.zeros((0, 3), np.float32)
        times = np.atleast_1d(out.radar_times if out.radar_times is not None else [0.0])
        scan_idx = int(np.argmin(np.abs(times - time_s)))
        radar_output = self.render_radar(variables, scan_idx, actor_edits)["radar_output"]
        pts, keep = sample_radar_points(jnp.asarray(radar_output), "euclidean", threshold=threshold)
        pts = np.asarray(pts)[np.asarray(keep)]
        r2w = np.asarray(out.radar_to_worlds[scan_idx], np.float64)
        return (pts @ r2w[:3, :3].T + r2w[:3, 3]).astype(np.float32)

    def render_lidar(
        self, variables, scan_idx: int, max_points: int = 16384, _defer: bool = False
    ) -> Dict[str, np.ndarray]:
        """Render rays for a (subsampled) lidar scan. With ``_defer`` the
        dict holds device arrays (no host sync) — see _fetch_deferred."""
        pts = self.outputs.lidar_points[scan_idx]
        num_valid = min(len(pts), max_points)
        if len(pts) > max_points:
            sel = np.random.RandomState(0).choice(len(pts), max_points, replace=False)
            pts = pts[sel]
        elif len(pts) == 0:  # empty scan: all-padding bundle, num_valid=0
            pts = np.zeros((max_points, 4), np.float32)
            pts[:, 0] = 1.0  # unit-x dummy direction (generate_rays normalizes)
        else:
            pad = max_points - len(pts)
            pts = np.concatenate([pts, np.repeat(pts[-1:], pad, axis=0)], axis=0)
        bundle = self.datamanager.tables.lidars.generate_rays(
            jnp.full((max_points,), scan_idx, jnp.int32), jnp.asarray(pts)
        )
        layout = SegmentLayout(num_lidar=max_points)
        bundle = merge_modality_bundles(None, bundle, None)
        outputs = self._eval_nff_chunk(variables, bundle, layout)
        rend = {
            "depth": outputs["depth"],
            "intensity": outputs["intensity"],
            "ray_drop_logits": outputs["ray_drop_logits"],
            "points": pts,
            # rows >= num_valid are padding (last point repeated to the
            # static shape) — metrics must mask them out
            "num_valid": num_valid,
        }
        return rend if _defer else _fetch_deferred(rend)

    def get_average_eval_lidar_metrics(self, variables, max_points: int = 16384) -> Dict[str, float]:
        """Depth/intensity/ray-drop/chamfer over eval lidar scans
        (cf. models/neuradar.py:738-769 and ad_model.get_outputs_for_lidar)."""
        med_l2, rel_l2, rmses, drop_accs, chamfers = [], [], [], [], []
        # dispatch every scan's render before fetching the first result
        # (device overlaps with host dispatch; one sync per scan otherwise)
        rends = [
            self.render_lidar(variables, int(scan_idx), max_points=max_points, _defer=True)
            for scan_idx in self.datamanager.eval_lidar_indices()
        ]
        for rend in rends:
            rend = _fetch_deferred(rend)
            n = int(rend["num_valid"])  # drop padding rays from every statistic
            if n == 0:
                continue
            pts = rend["points"][:n]
            gt_dist = np.linalg.norm(pts[:, :3], axis=1, keepdims=True)
            did_return = (gt_dist < 1e3)[:, 0]
            pred = rend["depth"][:n]
            if did_return.any():
                err = (pred[did_return] - gt_dist[did_return])[:, 0]
                med_l2.append(float(np.median(err**2)))
                rel_l2.append(float(np.mean((err / gt_dist[did_return][:, 0]) ** 2)))
                rmses.append(float(np.sqrt(np.mean((rend["intensity"][:n][did_return][:, 0] - pts[did_return, 3]) ** 2))))
            pred_drop = rend["ray_drop_prob"][:n, 0] > 0.5
            drop_accs.append(float((pred_drop == ~did_return).mean()))
            # chamfer between predicted return points and gt returns (both sensor frame)
            keep = ~pred_drop
            if keep.any() and did_return.any():
                dirs = pts[:, :3] / np.clip(np.linalg.norm(pts[:, :3], axis=1, keepdims=True), 1e-6, None)
                pred_pts = dirs[keep] * pred[keep]
                sel = np.random.RandomState(0)
                a = pred_pts[sel.choice(len(pred_pts), min(1000, len(pred_pts)), replace=False)]
                gt_pts = pts[did_return, :3]
                b = gt_pts[sel.choice(len(gt_pts), min(1000, len(gt_pts)), replace=False)]
                chamfers.append(radar_utils.chamfer_distance_np(a, b))
        return {
            "depth_median_l2": float(np.mean(med_l2)) if med_l2 else 0.0,
            "depth_mean_rel_l2": float(np.mean(rel_l2)) if rel_l2 else 0.0,
            "intensity_rmse": float(np.mean(rmses)) if rmses else 0.0,
            "ray_drop_accuracy": float(np.mean(drop_accs)) if drop_accs else 0.0,
            "lidar_chamfer_distance": float(np.mean(chamfers)) if chamfers else 0.0,
        }

    def get_average_eval_radar_metrics(
        self, variables, rng: Optional[jax.Array] = None, sampling_rounds: Optional[int] = None
    ) -> Dict[str, float]:
        """Chamfer/EMD/GOSPA over all eval radar scans
        (cf. ad_neuradar_pipeline.py:140-194 and models/neuradar.py:848-903)."""
        cfg = self.config.model
        loss_type = cfg.loss.radar_loss_type
        rounds = sampling_rounds or (self.config.radar_sampling_rounds if loss_type == "nll" else 1)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        chamfers, emds, gospas, locs, misses, falses = ([] for _ in range(6))
        n_empty_pred = 0
        scan_ids = [int(s) for s in self.datamanager.eval_radar_indices()]
        # dispatch all scans, then fetch (one pipeline drain instead of a
        # host<->device sync per scan)
        deferred = [self._render_radar_deferred(variables, s) for s in scan_ids]
        for scan_idx, dro in zip(scan_ids, deferred):
            ro = np.asarray(dro)[0]
            gt = self.outputs.radar_points[int(scan_idx)][:, :3]
            for i in range(rounds):
                rng, sub = jax.random.split(rng)
                pts, keep = radar_utils.sample_radar_points(
                    jnp.asarray(ro), loss_type, rng=sub, threshold=cfg.existence_probability_threshold
                )
                pred = np.asarray(pts)[np.asarray(keep)]
                if len(pred) and len(gt):
                    chamfers.append(radar_utils.chamfer_distance_np(pred, gt))
                    emds.append(radar_utils.emd_distance_np(pred, gt))
                elif len(gt):
                    # zero predicted points with GT present: chamfer/EMD are
                    # undefined for an empty set — count the scan-round
                    # separately instead of fabricating a magnitude (the miss
                    # still shows up in GOSPA's missed-target term below)
                    n_empty_pred += 1
                g, _, loc, miss, false = calculate_gospa(gt, pred)
                gospas.append(g)
                locs.append(loc)
                misses.append(miss)
                falses.append(false)
        return {
            "n_empty_pred_radar": n_empty_pred,
            "chamfer_distance_radar_mean": float(np.mean(chamfers)) if chamfers else 0.0,
            "chamfer_distance_radar_median": float(np.median(chamfers)) if chamfers else 0.0,
            "chamfer_distance_radar_std": float(np.std(chamfers)) if chamfers else 0.0,
            "emd_distance_radar_mean": float(np.mean(emds)) if emds else 0.0,
            "emd_distance_radar_median": float(np.median(emds)) if emds else 0.0,
            "gospa_mean": float(np.mean(gospas)) if gospas else 0.0,
            "gospa_loc_mean": float(np.mean(locs)) if locs else 0.0,
            "gospa_missed_mean": float(np.mean(misses)) if misses else 0.0,
            "gospa_false_mean": float(np.mean(falses)) if falses else 0.0,
        }

    def _driving_direction(self, cam_idx: int) -> np.ndarray:
        """Unit ego driving direction at a camera frame: the parser's camera
        velocity when available, else a finite difference of same-sensor
        camera positions (the reference reads the ray bundle's velocity
        metadata, ad_pipeline.py:327-331)."""
        out = self.outputs
        v = None
        if out.camera_velocities is not None:
            v = np.asarray(out.camera_velocities[cam_idx], np.float64)
            if np.linalg.norm(v) < 1e-3:
                v = None
        if v is None:
            same = np.where(out.camera_sensor_idxs == out.camera_sensor_idxs[cam_idx])[0]
            if len(same) < 2:
                return np.array([1.0, 0.0, 0.0])
            pos = out.camera_to_worlds[same, :3, 3].astype(np.float64)
            j = int(np.nonzero(same == cam_idx)[0][0])
            j0, j1 = (j - 1, j) if j == len(same) - 1 else (j, j + 1)
            v = pos[j1] - pos[j0]
        n = np.linalg.norm(v)
        return (v / n) if n > 1e-6 else np.array([1.0, 0.0, 0.0])

    def _fid_render(self, variables, cam_idx: int, hw, actor_edits=None, origin_shift=None) -> np.ndarray:
        rend = self.render_camera(variables, cam_idx, actor_edits=actor_edits, origin_shift=origin_shift)
        return np.clip(rend["rgb"][: hw[0], : hw[1]], 0.0, 1.0).astype(np.float32)

    def compute_fid_metrics(self, variables, max_frames: int = 16) -> Dict[str, float]:
        """Shift-view FIDs matching the reference's three families
        (ad_pipeline.py:170-191, 283-291, 310-405):

        * lane_shift_{0,2,3}_fid — ray origins shifted 0/2/3 m along
          (driving_direction x z) * lane_shift_sign, xy components only;
        * vertical_shift_1_fid — origins shifted 1 m up;
        * actor_shift_{rot,trans}_fid — actors rotated +-0.5 rad / shifted
          +-2 m laterally via ActorEdits.

        Real features come from the eval-split images. The extractor is the
        flax VGG trunk: without $NEURADAR_VGG19_WEIGHTS it runs on random
        filters, so every key gets a _vggsurrogate suffix (the reference
        semantics are torchmetrics Inception FID, ad_pipeline.py:26)."""
        from neuradar_tpu.model_components.dynamic_actors import ActorEdits
        from neuradar_tpu.model_components.fid import FeatureExtractor, frechet_distance
        from neuradar_tpu.model_components.vgg import has_pretrained_weights

        out = self.outputs
        u = self.config.model.rgb_upsample_factor
        H = out.image_size[0] // u * u
        W = out.image_size[1] // u * u
        extractor = FeatureExtractor(image_hw=(H, W))
        cam_ids = [int(c) for c in self.datamanager.eval_camera_indices()][:max_frames]
        real = out.images[cam_ids][:, :H, :W].astype(np.float32) / 255.0
        real_feats = extractor(real)
        sign = float(getattr(out, "lane_shift_sign", 1) or 1)
        z_up = np.array([0.0, 0.0, 1.0])

        families = ("lane_shift_0", "lane_shift_2", "lane_shift_3",
                    "vertical_shift_1", "actor_shift_rot", "actor_shift_trans")
        fakes = {k: [] for k in families}
        actor_edits = {
            "actor_shift_rot": [ActorEdits(rotation=0.5), ActorEdits(rotation=-0.5)],
            "actor_shift_trans": [ActorEdits(lateral=2.0), ActorEdits(lateral=-2.0)],
        }
        for cam_idx in cam_ids:
            right = np.cross(self._driving_direction(cam_idx), z_up)
            right[2] = 0.0  # the reference shifts xy only (ad_pipeline.py:334)
            fakes["lane_shift_0"].append(self._fid_render(variables, cam_idx, (H, W)))
            for shift in (2.0, 3.0):
                fakes[f"lane_shift_{shift:g}"].append(
                    self._fid_render(variables, cam_idx, (H, W), origin_shift=shift * sign * right)
                )
            fakes["vertical_shift_1"].append(
                self._fid_render(variables, cam_idx, (H, W), origin_shift=z_up)
            )
            for fam, edits in actor_edits.items():
                for e in edits:
                    fakes[fam].append(self._fid_render(variables, cam_idx, (H, W), actor_edits=e))

        suffix = "" if has_pretrained_weights() else "_vggsurrogate"
        return {
            f"{fam}_fid{suffix}": frechet_distance(real_feats, extractor(np.stack(imgs)))
            for fam, imgs in fakes.items()
        }

    def get_average_eval_image_metrics(self, variables) -> Dict[str, float]:
        """PSNR/SSIM + eval rays/sec + fps over all eval images
        (cf. ad_pipeline.py:146-294, rays/sec timing at :216-221)."""
        import time

        psnrs, ssims, lpips_vals = [], [], []
        u = self.config.model.rgb_upsample_factor
        total_rays = 0
        t0 = time.perf_counter()
        n_images = 0
        lpips = None
        for cam_idx in self.datamanager.eval_camera_indices():
            rend = self.render_camera(variables, int(cam_idx))
            gt = self.outputs.images[int(cam_idx)].astype(np.float32) / 255.0
            h, w = rend["rgb"].shape[:2]
            total_rays += (h // u) * (w // u)
            n_images += 1
            gt = gt[: h, : w]
            mse = float(np.mean((rend["rgb"] - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
            ssims.append(_ssim_np(rend["rgb"], gt))
            if lpips is None:
                from neuradar_tpu.model_components.fid import PerceptualDistance

                lpips = PerceptualDistance(image_hw=(h, w))
            lpips_vals.append(lpips(rend["rgb"], gt))
        dt = max(time.perf_counter() - t0, 1e-9)
        from neuradar_tpu.model_components.vgg import has_pretrained_weights

        lpips_key = "lpips_vgg" if has_pretrained_weights() else "lpips_vggsurrogate"
        return {
            "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "ssim": float(np.mean(ssims)) if ssims else 0.0,
            lpips_key: float(np.mean(lpips_vals)) if lpips_vals else 0.0,
            "eval_rays_per_sec": total_rays / dt,
            "fps": n_images / dt,
        }


def _fetch_deferred(rend: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Materialize a deferred render dict on host (the sync point) and derive
    ray_drop_prob from the logits."""
    out = {k: np.asarray(v) for k, v in rend.items()}
    if "ray_drop_logits" in out:
        out["ray_drop_prob"] = 1 / (1 + np.exp(-out.pop("ray_drop_logits")))
    return out


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _ssim_np(a: np.ndarray, b: np.ndarray, c1=0.01**2, c2=0.03**2, win=11, sigma=1.5) -> float:
    """Gaussian-window SSIM matching torchmetrics semantics, data range 1.0.

    The reference's SSIM metric is torchmetrics'
    `structural_similarity_index_measure` (reference models/neuradar.py:318,735):
    11x11 gaussian window (sigma=1.5), k1=0.01/k2=0.03, population (filter-
    normalized) moments, and the scalar is the SSIM map averaged over VALID
    windows only (torchmetrics reflect-pads, convolves, then crops the pad
    back off — equivalent to a valid convolution on the unpadded image).
    """
    from scipy.ndimage import correlate1d

    h, w = a.shape[:2]
    win = min(win, h - (h + 1) % 2, w - (w + 1) % 2)  # largest odd size that fits
    k = _gaussian_kernel1d(win, sigma)
    p = (win - 1) // 2

    def filt(img):
        out = correlate1d(img, k, axis=0, mode="constant")
        out = correlate1d(out, k, axis=1, mode="constant")
        return out[p : h - p, p : w - p]  # valid region: windows never touch the border

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu_a = filt(a)
    mu_b = filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    ssim = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
    return float(ssim.mean())
