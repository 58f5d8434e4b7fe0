"""Data manager: host-side sampling + device-side ray generation.

cf. reference nerfstudio/data/datamanagers/* (ImageLidarRadarDataManager and
the ScaledPatchSampler / LidarPointSampler / RadarPointSampler at
data/pixel_samplers.py:485-694, 709-860). TPU re-design:

* The reference's 8 mp.Process workers build RayBundles on CPU and ship them
  whole. Here the host only samples *indices* (numpy, microseconds) — patch
  corners, lidar point subsets, radar scan ids — and the rays are generated
  INSIDE the jitted train step from device-resident sensor tables
  (build_train_bundle). Host->device traffic per step is just ground truth.
* A background thread prefetches host batches through a small queue
  (replacing mp.Queue at image_lidar_datamanager.py:83-148).
* Radar ground truth is padded to a static [num_scans, max_gt, 3] layout.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from neuradar_tpu.cameras.cameras import Cameras, generate_camera_rays
from neuradar_tpu.cameras.lidars import Lidars
from neuradar_tpu.cameras.radars import Radars, fov_grid
from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.data.dataparsers.base import DataparserOutputs
from neuradar_tpu.models.neuradar import SegmentLayout


@dataclass
class ADDataManagerConfig:
    """Batch composition (cf. ad_neuradar_datamanager.py:45-52 and
    image_lidar_radar_datamanager.py:84-87: 40960 cam + 16384 lidar rays +
    16 radar scans)."""

    num_rgb_patches: int = 40
    patch_size: int = 32  # rendered rays per patch side
    num_lidar_rays: int = 16384
    num_radar_scans: int = 16
    max_radar_gt: int = 256
    prefetch_depth: int = 4
    seed: int = 42

    @classmethod
    def micro(cls) -> "ADDataManagerConfig":
        """The smallest all-modality batch (~6.6k rays with the ZOD FoV
        grid). bench.py and validate_learning share this exact shape: it is
        the program empirically known to survive relay episodes that crash
        every larger production train step (docs/PERFORMANCE.md). The 1029
        lidar rays keep the total (2048 + 1029 + 3531 = 6608) divisible by
        nff_chunks 8/16 with the parity-corrected 3531-ray radar scan."""
        return cls(num_rgb_patches=2, patch_size=32, num_lidar_rays=1029,
                   num_radar_scans=1, max_radar_gt=128)


@struct.dataclass
class SensorTables:
    """Device-resident sensor tables (pytree)."""

    cameras: Cameras
    lidars: Lidars
    radars: Radars
    num_cam_frames: int = struct.field(pytree_node=False, default=0)
    num_lidar_frames: int = struct.field(pytree_node=False, default=0)
    num_radar_frames: int = struct.field(pytree_node=False, default=0)


def build_sensor_tables(out: DataparserOutputs) -> SensorTables:
    nc = len(out.camera_to_worlds)
    cam_meta = {"sensor_idxs": jnp.asarray(out.camera_sensor_idxs[:, None], jnp.int32)}
    if out.camera_velocities is not None and out.rolling_shutter_offsets is not None:
        cam_meta["velocities"] = jnp.asarray(out.camera_velocities)
        cam_meta["rolling_shutter_offsets"] = jnp.asarray(out.rolling_shutter_offsets)
        if out.rolling_shutter_horizontal is not None:
            cam_meta["rs_horizontal"] = jnp.asarray(out.rolling_shutter_horizontal)[:, None]
    cameras = Cameras(
        camera_to_worlds=jnp.asarray(out.camera_to_worlds),
        fx=jnp.asarray(out.intrinsics[:, 0:1]),
        fy=jnp.asarray(out.intrinsics[:, 1:2]),
        cx=jnp.asarray(out.intrinsics[:, 2:3]),
        cy=jnp.asarray(out.intrinsics[:, 3:4]),
        width=jnp.full((nc, 1), out.image_size[1], jnp.int32),
        height=jnp.full((nc, 1), out.image_size[0], jnp.int32),
        camera_type=jnp.asarray(out.camera_type[:, None], jnp.int32),
        distortion_params=None if out.distortion_params is None else jnp.asarray(out.distortion_params),
        times=jnp.asarray(out.camera_times[:, None], jnp.float32),
        metadata=cam_meta,
    )
    lidar_meta = {"sensor_idxs": jnp.asarray(out.lidar_sensor_idxs[:, None], jnp.int32)}
    if out.lidar_velocities is not None:
        lidar_meta["velocities"] = jnp.asarray(out.lidar_velocities)
    lidars = Lidars(
        lidar_to_worlds=jnp.asarray(out.lidar_to_worlds),
        lidar_type=jnp.zeros((len(out.lidar_to_worlds), 1), jnp.int32),
        times=jnp.asarray(out.lidar_times[:, None], jnp.float32),
        metadata=lidar_meta,
    )
    # camera-only datasets (e.g. transforms.json ingestion) carry no radar
    # FoV; any placeholder works since num_radar_frames == 0 gates all use
    fov = out.radar_fov or {
        "min_azimuth": -0.5, "max_azimuth": 0.5, "min_elevation": -0.1,
        "max_elevation": 0.1, "azimuth_step": 0.1, "elevation_step": 0.1,
    }
    radars = Radars(
        radar_to_worlds=jnp.asarray(out.radar_to_worlds),
        radar_type=jnp.zeros((len(out.radar_to_worlds), 1), jnp.int32),
        fov_directions=jnp.asarray(
            fov_grid(fov["min_azimuth"], fov["max_azimuth"], fov["min_elevation"], fov["max_elevation"],
                     fov["azimuth_step"], fov["elevation_step"])
        ),
        times=jnp.asarray(out.radar_times[:, None], jnp.float32),
        metadata={"sensor_idxs": jnp.asarray(out.radar_sensor_idxs[:, None], jnp.int32)},
        azimuth_ray_divergence=fov["azimuth_step"],
        elevation_ray_divergence=fov["elevation_step"],
    )
    return SensorTables(
        cameras=cameras,
        lidars=lidars,
        radars=radars,
        num_cam_frames=nc,
        num_lidar_frames=len(out.lidar_to_worlds),
        num_radar_frames=len(out.radar_to_worlds),
    )


def build_train_bundle(
    tables: SensorTables,
    batch: Dict[str, jax.Array],
    layout: SegmentLayout,
    rgb_upsample_factor: int = 3,
) -> RayBundle:
    """Assemble the merged [cam | lidar | radar] bundle inside jit.

    The camera segment shoots one ray per upsample_factor x upsample_factor
    GT pixel block, centered (cf. ScaledPatchSampler, pixel_samplers.py:709).
    """
    ps = layout.patch_size[0]
    u = rgb_upsample_factor
    cam_bundle = lidar_bundle = radar_bundle = None
    if layout.num_cam > 0:
        # per-patch ray coords: centers of u x u blocks
        grid = jnp.arange(ps) * u + u // 2
        rr, cc = jnp.meshgrid(grid, grid, indexing="ij")
        offsets = jnp.stack([rr.reshape(-1), cc.reshape(-1)], axis=-1)  # [ps*ps, 2]
        coords = batch["patch_tl"][:, None, :] + offsets[None]  # [B, ps*ps, 2]
        cam_idx = jnp.repeat(batch["cam_frame_idx"], ps * ps)
        cam_bundle = generate_camera_rays(tables.cameras, cam_idx, coords.reshape(-1, 2))

    if layout.num_lidar > 0:
        lidar_bundle = tables.lidars.generate_rays(batch["lidar_scan_idx"], batch["lidar_points"])
        # frame-index offsets so the camera optimizer sees unique frame ids
        lidar_bundle = lidar_bundle.replace(camera_indices=lidar_bundle.camera_indices + tables.num_cam_frames)
    if layout.num_radar_scans > 0:
        radar_bundle = tables.radars.generate_rays(batch["radar_scan_idx"])
        radar_bundle = radar_bundle.replace(
            camera_indices=radar_bundle.camera_indices + tables.num_cam_frames + tables.num_lidar_frames
        )
    return merge_modality_bundles(cam_bundle, lidar_bundle, radar_bundle)


def merge_modality_bundles(cam: Optional[RayBundle], lidar: Optional[RayBundle], radar: Optional[RayBundle]) -> RayBundle:
    """Concatenate per-modality bundles, normalizing metadata keys
    (cf. _merge_img_lidar_radar, image_lidar_radar_datamanager.py:335-409 —
    but with static segment layout instead of boolean masks)."""
    bundles = [b for b in (cam, lidar, radar) if b is not None]
    keys = set()
    donors = {}
    for b in bundles:
        keys |= set(b.metadata.keys())
        for k, v in b.metadata.items():
            donors.setdefault(k, v)
    for b in bundles:
        n = b.origins.shape[0]
        md = dict(b.metadata)
        # semantic defaults, then generic zero-fill so ANY metadata key union
        # merges cleanly (camera-only keys, velocities, ...)
        if "did_return" not in md and "did_return" in keys:
            md["did_return"] = jnp.ones((n, 1), bool)  # non-lidar rays count as returns
        if "directions_norm" not in md:
            md["directions_norm"] = jnp.ones((n, 1), b.origins.dtype)
        for k in keys:
            if k not in md:
                donor = donors[k]
                md[k] = jnp.zeros((n, *donor.shape[1:]), donor.dtype)
        b.metadata.clear()
        b.metadata.update(md)

    def cat(field):
        vals = [getattr(b, field) for b in bundles]
        if all(v is None for v in vals):
            return None
        if field == "times":
            # zero-fill bundles without timestamps instead of dropping the
            # real per-point times other modalities carry
            vals = [
                v if v is not None else jnp.zeros((b.origins.shape[0], 1), b.origins.dtype)
                for v, b in zip(vals, bundles)
            ]
        elif any(v is None for v in vals):
            return None
        return jnp.concatenate(vals, axis=0)

    metadata = {k: jnp.concatenate([b.metadata[k] for b in bundles], axis=0) for k in sorted(keys)}
    return RayBundle(
        origins=cat("origins"),
        directions=cat("directions"),
        pixel_area=cat("pixel_area"),
        nears=cat("nears"),
        fars=cat("fars"),
        times=cat("times"),
        camera_indices=cat("camera_indices"),
        metadata=metadata,
    )


class ADDataManager:
    """Host-side sampler + prefetcher."""

    def __init__(self, outputs: DataparserOutputs, config: ADDataManagerConfig, rgb_upsample_factor: int = 3):
        self.outputs = outputs
        self.config = config
        self.u = rgb_upsample_factor
        self.rng = np.random.RandomState(config.seed)
        # eval batches are drawn on the MAIN thread while the prefetch
        # thread consumes self.rng — numpy RandomState is not thread-safe,
        # so the eval split gets its own generator
        self.eval_rng = np.random.RandomState(config.seed + 9999)
        self.tables = build_sensor_tables(outputs)

        # host caches
        self.images_u8 = np.ascontiguousarray(outputs.images)  # [Nc, H, W, 3] uint8
        # pixel masks (True = keep; cf. reference PixelSampler
        # rejection_sample_mask, pixel_samplers.py:53-110): patch top-lefts
        # are rejection-sampled so accepted patches avoid masked pixels.
        # Integral images make the per-patch masked-pixel count O(1).
        masks = getattr(outputs, "masks", None)
        if masks is not None:
            inv = (~np.asarray(masks, bool)).astype(np.int64)  # 1 = masked
            self._mask_integral = np.zeros((inv.shape[0], inv.shape[1] + 1, inv.shape[2] + 1), np.int64)
            self._mask_integral[:, 1:, 1:] = inv.cumsum(axis=1).cumsum(axis=2)
        else:
            self._mask_integral = None
        self._pack_lidar(outputs)
        self._pad_radar(outputs)
        self._queue: Optional[queue.Queue] = None
        self._stop = threading.Event()

    # -- caches ------------------------------------------------------------

    def _pack_lidar(self, out: DataparserOutputs) -> None:
        def pack(scans):
            pts, scan_ids = [], []
            for si in scans:
                p = out.lidar_points[si]
                pts.append(p)
                scan_ids.append(np.full(len(p), si, np.int64))
            if not pts:
                return np.zeros((0, 6), np.float32), np.zeros((0,), np.int64)
            return np.concatenate(pts, axis=0), np.concatenate(scan_ids, axis=0)

        self.lidar_points_packed, self.lidar_scan_ids_packed = pack(out.lidar_split.train)
        self.eval_lidar_points_packed, self.eval_lidar_scan_ids_packed = pack(out.lidar_split.eval)

    def _pad_radar(self, out: DataparserOutputs) -> None:
        g = self.config.max_radar_gt
        n = len(out.radar_points)
        self.radar_gt = np.zeros((n, g, 3), np.float32)
        self.radar_gt_mask = np.zeros((n, g), bool)
        for i, p in enumerate(out.radar_points):
            k = min(len(p), g)
            self.radar_gt[i, :k] = p[:k, :3]
            self.radar_gt_mask[i, :k] = True

    # -- layout --------------------------------------------------------------

    @property
    def layout(self) -> SegmentLayout:
        c = self.config
        return SegmentLayout(
            num_cam=c.num_rgb_patches * c.patch_size**2,
            num_lidar=c.num_lidar_rays,
            num_radar_scans=c.num_radar_scans,
            rays_per_scan=int(self.tables.radars.rays_per_scan),
            patch_size=(c.patch_size, c.patch_size),
        )

    # -- sampling ------------------------------------------------------------

    def sample_eval_batch(self) -> Dict[str, np.ndarray]:
        """Same layout as a train batch, drawn from the eval split
        (cf. get_eval_loss_dict path, base_pipeline)."""
        return self.sample_train_batch(split="eval")

    def sample_train_batch(self, split: str = "train") -> Dict[str, np.ndarray]:
        c = self.config
        out = self.outputs
        H, W = out.image_size
        gt_patch = c.patch_size * self.u
        cam_split = out.camera_split.train if split == "train" else out.camera_split.eval
        radar_split = out.radar_split.train if split == "train" else out.radar_split.eval
        packed_pts = self.lidar_points_packed if split == "train" else self.eval_lidar_points_packed
        packed_ids = self.lidar_scan_ids_packed if split == "train" else self.eval_lidar_scan_ids_packed

        from neuradar_tpu import native

        rng = self.rng if split == "train" else self.eval_rng
        cam_frames = rng.choice(cam_split, size=c.num_rgb_patches)
        tl_r = rng.randint(0, H - gt_patch + 1, size=c.num_rgb_patches)
        tl_c = rng.randint(0, W - gt_patch + 1, size=c.num_rgb_patches)
        if self._mask_integral is not None:
            tl_r, tl_c = self._reject_masked_patches(rng, cam_frames, tl_r, tl_c, gt_patch, H, W)
        top_left = np.stack([tl_r, tl_c], axis=1)
        # gather GT patches in uint8 (threaded C++ gather) and normalize on
        # DEVICE: 4x less host->device traffic than f32 (the biggest per-step
        # transfer), and the gather itself doesn't serialize the host thread
        rgb = native.sample_patches_u8(self.images_u8, cam_frames, top_left, gt_patch)

        pt_idx = rng.randint(0, len(packed_pts), size=c.num_lidar_rays)
        lidar_points, lidar_scan_idx = native.sample_points(packed_pts, packed_ids, pt_idx)

        radar_scan_idx = rng.choice(radar_split, size=c.num_radar_scans)
        lidar_dist = np.linalg.norm(lidar_points[:, :3], axis=-1, keepdims=True).astype(np.float32)

        return {
            "cam_frame_idx": cam_frames.astype(np.int32),
            "patch_tl": np.stack([tl_r, tl_c], axis=1).astype(np.int32),
            "image": rgb,  # uint8; normalized to [0,1] f32 on device
            "lidar_scan_idx": lidar_scan_idx.astype(np.int32),
            "lidar_points": lidar_points.astype(np.float32),
            "lidar_distance": lidar_dist,
            "lidar_intensity": lidar_points[:, 3:4].astype(np.float32),
            "did_return": lidar_dist < 1e3,
            "radar_scan_idx": radar_scan_idx.astype(np.int32),
            "radar_gt": self.radar_gt[radar_scan_idx],
            "radar_gt_mask": self.radar_gt_mask[radar_scan_idx],
        }

    def _masked_counts(self, cam_frames, tl_r, tl_c, gt_patch):
        """Masked-pixel count per candidate patch via the integral image."""
        ii = self._mask_integral[cam_frames]
        b = np.arange(len(cam_frames))
        return (
            ii[b, tl_r + gt_patch, tl_c + gt_patch]
            - ii[b, tl_r, tl_c + gt_patch]
            - ii[b, tl_r + gt_patch, tl_c]
            + ii[b, tl_r, tl_c]
        )

    def _reject_masked_patches(self, rng, cam_frames, tl_r, tl_c, gt_patch, H, W, max_iters: int = 20):
        """Resample patch top-lefts whose footprint touches masked pixels
        (reference rejection_sample_mask with max_num_iterations; here the
        fallback keeps the least-masked candidate seen)."""
        best_r, best_c = tl_r.copy(), tl_c.copy()
        best_bad = self._masked_counts(cam_frames, best_r, best_c, gt_patch)
        for _ in range(max_iters):
            redo = best_bad > 0
            if not redo.any():
                break
            n = int(redo.sum())
            cand_r = rng.randint(0, H - gt_patch + 1, size=n)
            cand_c = rng.randint(0, W - gt_patch + 1, size=n)
            cand_bad = self._masked_counts(cam_frames[redo], cand_r, cand_c, gt_patch)
            improve = cand_bad < best_bad[redo]
            idx = np.flatnonzero(redo)[improve]
            best_r[idx], best_c[idx] = cand_r[improve], cand_c[improve]
            best_bad[idx] = cand_bad[improve]
        return best_r, best_c

    # -- prefetching -----------------------------------------------------------

    def start_prefetch(self) -> None:
        if self._queue is not None:
            return
        self._queue = queue.Queue(maxsize=self.config.prefetch_depth)

        self._worker_error: Optional[BaseException] = None

        def worker():
            try:
                while not self._stop.is_set():
                    batch = self.sample_train_batch()
                    while not self._stop.is_set():
                        try:
                            self._queue.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # noqa: BLE001 — surfaced in next_train
                self._worker_error = e

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def next_train(self) -> Dict[str, np.ndarray]:
        if self._queue is not None:
            while True:  # bounded waits so a dead worker raises, not hangs
                try:
                    return self._queue.get(timeout=5.0)
                except queue.Empty:
                    if self._worker_error is not None:
                        raise RuntimeError("prefetch worker died") from self._worker_error
        return self.sample_train_batch()

    def stop(self) -> None:
        self._stop.set()

    def change_patch_sampler(self, patch_size: int, num_rgb_patches: Optional[int] = None) -> None:
        """Runtime patch reconfiguration (cf. reference
        ad_datamanager.change_patch_sampler:77-96, which re-tunes every data
        worker): stop the prefetcher, swap the patch layout, restart.
        Callers holding a jitted step must rebuild it — the batch shapes
        changed (Trainer.change_patch_sampler does this)."""
        was_running = self._queue is not None
        if was_running:
            self._stop.set()
            if getattr(self, "_thread", None) is not None:
                # drain so a blocked put() observes the stop flag
                try:
                    while True:
                        self._queue.get_nowait()
                except queue.Empty:
                    pass
                self._thread.join(timeout=10.0)
        self._stop = threading.Event()
        self._queue = None
        self.config.patch_size = patch_size
        if num_rgb_patches is not None:
            self.config.num_rgb_patches = num_rgb_patches
        if was_running:
            self.start_prefetch()

    def get_accumulated_lidar_points(
        self, remove_dynamic: bool = False, split: str = "train", max_points: int = 0
    ) -> np.ndarray:
        """World-space lidar cloud accumulated over a split's scans
        (cf. reference ad_datamanager.get_accumulated_lidar_points:98-115 +
        data_utils.remove_dynamic_points:110-139). remove_dynamic prunes
        points inside any non-stationary actor box (15% padded) at the
        scan's timestamp. max_points>0 subsamples evenly (viewer overlays).
        Returns [N, 3] float32."""
        out = self.outputs
        scans = out.lidar_split.train if split == "train" else out.lidar_split.eval
        trajs = [t for t in out.trajectories if not t.get("stationary", False)]
        clouds = []
        for si in scans:
            pc = out.lidar_points[int(si)][:, :3].astype(np.float64)
            l2w = np.asarray(out.lidar_to_worlds[int(si)], np.float64)
            world = pc @ l2w[:3, :3].T + l2w[:3, 3]
            if remove_dynamic and trajs:
                t_scan = float(out.lidar_times[int(si)])
                keep = np.ones(len(world), bool)
                for traj in trajs:
                    dt = np.abs(np.asarray(traj["timestamps"], np.float64) - t_scan)
                    j = int(np.argmin(dt))
                    if dt[j] > 0.08:  # no pose near this scan
                        continue
                    pose = np.asarray(traj["poses"][j], np.float64)
                    local = (world - pose[:3, 3]) @ pose[:3, :3]  # world -> box
                    half = np.asarray(traj["dims"], np.float64) * 1.15 / 2.0  # (w, l, h) ~ box (x, y, z)
                    keep &= ~(np.abs(local) <= half).all(axis=1)
                world = world[keep]
            clouds.append(world)
        allp = np.concatenate(clouds).astype(np.float32) if clouds else np.zeros((0, 3), np.float32)
        if max_points and len(allp) > max_points:
            allp = allp[np.linspace(0, len(allp) - 1, max_points).astype(np.int64)]
        return allp

    # -- eval helpers ------------------------------------------------------------

    def eval_camera_indices(self) -> np.ndarray:
        return self.outputs.camera_split.eval

    def eval_radar_indices(self) -> np.ndarray:
        return self.outputs.radar_split.eval

    def eval_lidar_indices(self) -> np.ndarray:
        return self.outputs.lidar_split.eval
