"""Native C++ batch-sampler tests (with numpy fallback parity)."""

import numpy as np

from neuradar_tpu import native


def test_sample_patches_u8_matches_numpy():
    rng = np.random.RandomState(2)
    imgs = (rng.rand(4, 32, 48, 3) * 255).astype(np.uint8)
    fi = np.array([2, 0, 3], np.int32)
    tl = np.array([[1, 3], [24, 40], [0, 0]], np.int32)
    out = native.sample_patches_u8(imgs, fi, tl, 8)
    ref = np.stack([imgs[f, r : r + 8, c : c + 8] for f, (r, c) in zip(fi, tl)])
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)
    assert native.sample_patches_u8(imgs, np.zeros((0,), np.int32), np.zeros((0, 2), np.int32), 8).shape == (0, 8, 8, 3)


def test_sample_points_matches_numpy():
    rng = np.random.RandomState(1)
    pts = rng.rand(1000, 6).astype(np.float32)
    ids = rng.randint(0, 20, 1000).astype(np.int64)
    idx = rng.randint(0, 1000, 64).astype(np.int64)
    op, osc = native.sample_points(pts, ids, idx)
    np.testing.assert_allclose(op, pts[idx])
    np.testing.assert_array_equal(osc, ids[idx].astype(np.int32))
