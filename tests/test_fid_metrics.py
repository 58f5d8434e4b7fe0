"""Shift-view FID families (lane / vertical / actor) on the synthetic scene
(cf. reference ad_pipeline.py:170-191, 283-291, 310-405)."""

import numpy as np

from neuradar_tpu.data.dataparsers.base import linspaced_split


def _tiny_fid_pipeline():
    import __graft_entry__

    pipe = __graft_entry__._tiny_pipeline()
    # 3 eval frames so the feature covariance in the Frechet distance is
    # non-degenerate (the default split gives a single eval frame)
    out = pipe.outputs
    out.camera_split = linspaced_split(len(out.camera_to_worlds), 0.375)
    return pipe


def test_compute_fid_metrics_families():
    pipe = _tiny_fid_pipeline()
    variables = pipe.init_variables(0)
    m = pipe.compute_fid_metrics(variables, max_frames=3)
    expect = {
        "lane_shift_0_fid", "lane_shift_2_fid", "lane_shift_3_fid",
        "vertical_shift_1_fid", "actor_shift_rot_fid", "actor_shift_trans_fid",
    }
    # no pretrained VGG in CI: every key must carry the surrogate marker
    assert set(m) == {f"{k}_vggsurrogate" for k in expect}
    for k, v in m.items():
        assert np.isfinite(v) and v >= 0.0, (k, v)
    # unshifted renders should sit closer to the real distribution than the
    # 3 m lane shift for an untrained model too weak to extrapolate; at
    # minimum the families must not be identical (the shifts actually moved
    # the rays / actors)
    vals = list(m.values())
    assert len(set(np.round(vals, 6))) > 1


def test_driving_direction_and_sign():
    pipe = _tiny_fid_pipeline()
    # synthetic ego drives +x; driving direction must reflect that even
    # without parser velocities (finite-difference fallback)
    d = pipe._driving_direction(int(pipe.datamanager.eval_camera_indices()[0]))
    np.testing.assert_allclose(d, [1.0, 0.0, 0.0], atol=1e-3)
    # lane_shift_sign default is +1 unless the parser provides one
    assert getattr(pipe.outputs, "lane_shift_sign", 1) in (-1, 1)


def test_zod_lane_shift_sign_table():
    from neuradar_tpu.data.dataparsers.zod import ZOD_LANE_SHIFT_SIGN

    assert ZOD_LANE_SHIFT_SIGN["000005"] == 1
    assert ZOD_LANE_SHIFT_SIGN["000581"] == -1
    # unknown sequences default to -1 (reference defaultdict semantics)
    assert ZOD_LANE_SHIFT_SIGN.get("999999", -1) == -1
