"""Mask-aware patch sampling (datamanager rejection sampling against
DataparserOutputs.masks; cf. reference pixel_samplers rejection_sample_mask
and the nuScenes mask_dir flow)."""

import dataclasses

import numpy as np

from neuradar_tpu.data.datamanager import ADDataManager, ADDataManagerConfig
from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig


def _outputs_with_masks():
    cfg = SyntheticDataParserConfig(num_frames=4, image_height=48, image_width=72,
                                    lidar_points_per_scan=256)
    out = SyntheticDataParser(cfg).get_dataparser_outputs()
    # mask out the LEFT half of every image
    masks = np.ones((len(out.images), 48, 72), bool)
    masks[:, :, :36] = False
    return dataclasses.replace(out, masks=masks)


def _dm(out):
    return ADDataManager(out, ADDataManagerConfig(num_rgb_patches=8, patch_size=4,
                                                  num_lidar_rays=32, num_radar_scans=1,
                                                  max_radar_gt=16), rgb_upsample_factor=3)


def test_patches_avoid_masked_half():
    dm = _dm(_outputs_with_masks())
    gt_patch = 4 * 3
    for _ in range(5):
        b = dm.sample_train_batch()
        # every accepted patch lies fully in the unmasked right half
        assert (b["patch_tl"][:, 1] >= 36).all(), b["patch_tl"]
        assert (b["patch_tl"][:, 1] + gt_patch <= 72).all()


def test_no_masks_is_unrestricted():
    cfg = SyntheticDataParserConfig(num_frames=4, image_height=48, image_width=72,
                                    lidar_points_per_scan=256)
    out = SyntheticDataParser(cfg).get_dataparser_outputs()
    dm = _dm(out)
    tls = np.concatenate([dm.sample_train_batch()["patch_tl"] for _ in range(6)])
    assert (tls[:, 1] < 36).any()  # left half reachable without masks


def test_fully_masked_falls_back_to_least_masked():
    """A pathological all-masked frame must not hang — rejection gives up
    after max_iters and keeps the best candidate."""
    out = _outputs_with_masks()
    masks = np.zeros_like(out.masks)
    out = dataclasses.replace(out, masks=masks)
    dm = _dm(out)
    b = dm.sample_train_batch()
    assert b["patch_tl"].shape == (8, 2)
