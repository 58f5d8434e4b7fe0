"""ZOD / VoD dataparser logic against synthetic on-disk data and a mocked
devkit (the datasets themselves are not in this image; this validates the
parsing/convention code paths, cf. reference zod_dataparser/vod_dataparser)."""

import json
import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------- VoD (files)


def _write_vod_tree(root, n_frames=5, h=16, w=24):
    import PIL.Image

    for sub in ("pose", "image_2", "velodyne", "calib"):
        (root / "lidar" / "training" / sub).mkdir(parents=True)
    (root / "radar" / "training" / "velodyne").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for fi in range(n_frames):
        l2w = np.eye(4)
        l2w[:3, 3] = [fi * 1.0, 0.0, 0.0]
        (root / "lidar" / "training" / "pose" / f"{fi:05d}.json").write_text(
            json.dumps({"odomto_camera": l2w.reshape(-1).tolist()})
        )
        P2 = np.zeros((3, 4))
        P2[0, 0], P2[1, 1], P2[0, 2], P2[1, 2] = 100.0, 101.0, w / 2, h / 2
        Tr = np.hstack([np.eye(3), np.zeros((3, 1))])
        lines = [
            "P2: " + " ".join(map(str, P2.reshape(-1))),
            "Tr_velo_to_cam: " + " ".join(map(str, Tr.reshape(-1))),
        ]
        (root / "lidar" / "training" / "calib" / f"{fi:05d}.txt").write_text("\n".join(lines))
        PIL.Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            root / "lidar" / "training" / "image_2" / f"{fi:05d}.jpg"
        )
        rng.randn(32, 4).astype(np.float32).tofile(root / "lidar" / "training" / "velodyne" / f"{fi:05d}.bin")
        rng.randn(8, 7).astype(np.float32).tofile(root / "radar" / "training" / "velodyne" / f"{fi:05d}.bin")


def test_vod_parser(tmp_path):
    from neuradar_tpu.data.dataparsers.vod import VodDataParserConfig

    _write_vod_tree(tmp_path, n_frames=5)
    out = VodDataParserConfig(sequence="00", data=str(tmp_path)).setup().get_dataparser_outputs()
    assert out.images.shape == (5, 16, 24, 3)
    assert out.camera_to_worlds.shape == (5, 3, 4)
    np.testing.assert_allclose(out.intrinsics[0], [100.0, 101.0, 12.0, 8.0])
    # recentered: mean of all sensor positions at origin
    allp = np.concatenate([out.camera_to_worlds[:, :, 3], out.lidar_to_worlds[:, :, 3],
                           out.radar_to_worlds[:, :, 3]])
    np.testing.assert_allclose(allp.mean(0), 0.0, atol=1e-5)
    assert len(out.lidar_points) == 5 and out.lidar_points[0].shape[1] == 6
    assert len(out.radar_points) == 5 and out.radar_points[0].shape == (8, 3)
    assert out.radar_fov["azimuth_step"] == 0.02
    # times zero-based at 10 Hz
    np.testing.assert_allclose(out.camera_times, np.arange(5) / 10.0, atol=1e-6)


# ------------------------------------------------------------ ZOD (mock devkit)


class _TS:
    def __init__(self, t):
        self._t = t

    def timestamp(self):
        return self._t


class _CamFrame:
    def __init__(self, t, img):
        self.time = _TS(t)
        self._img = img

    def read(self):
        return self._img


class _LidarData:
    def __init__(self, rng, t):
        n = 64
        self.points = rng.randn(n, 3).astype(np.float64) * 10
        self.timestamps = np.full(n, t) + rng.rand(n) * 0.05
        self.intensity = rng.randint(0, 255, n).astype(np.float64)
        self.diode_idx = rng.randint(0, 128, n)


class _LidarFrame:
    def __init__(self, rng, t):
        self._data = _LidarData(rng, t)

    def read(self):
        return self._data


class _Extr:
    def __init__(self, transform):
        self.transform = transform


class _CamCalib:
    def __init__(self):
        self.extrinsics = _Extr(np.eye(4))
        self.intrinsics = np.array([[120.0, 0, 16], [0, 121.0, 400], [0, 0, 1]])
        self.distortion = np.array([0.1, -0.05, 0.001, -0.002])


class _Seq:
    def __init__(self, root):
        rng = np.random.RandomState(0)
        h = 756  # HOOD_HEIGHT=750 crop leaves 6 rows
        self._cam_frames = [_CamFrame(100.0 + i, rng.randint(0, 255, (h, 32, 3), np.uint8))
                            for i in range(4)]
        self._lidar_frames = [_LidarFrame(rng, 100.0 + i + 0.5) for i in range(3)]
        consts = sys.modules["zod.constants"]
        self.calibration = types.SimpleNamespace(
            cameras={consts.Camera.FRONT: _CamCalib()},
            lidars={consts.Lidar.VELODYNE: types.SimpleNamespace(extrinsics=_Extr(np.eye(4)))},
            radars={consts.Radar.FRONT: types.SimpleNamespace(extrinsics=_Extr(np.eye(4)))},
        )
        self.info = types.SimpleNamespace(
            get_camera_frames=lambda anonymization=None: self._cam_frames,
            get_lidar_frames=lambda: self._lidar_frames,
        )
        self.ego_motion = types.SimpleNamespace(get_poses=self._pose)

    @staticmethod
    def _pose(t):
        p = np.eye(4)
        p[0, 3] = float(np.median(t)) - 100.0  # ego drives +x at 1 m/s
        return p

    def get_annotation(self, name):
        pose = np.eye(4)
        pose[:3, 3] = [5.0, 1.0, 0.0]
        obj = {"name": "Vehicle", "uuid": "actor-1", "pose": pose, "size": [2.0, 4.5, 1.6]}
        return [{"timestamp": 100.0 + i, "objects": [obj]} for i in range(3)]


@pytest.fixture()
def mock_zod(monkeypatch, tmp_path):
    consts = types.ModuleType("zod.constants")

    class _E:  # minimal enum stand-ins
        pass

    consts.Anonymization = types.SimpleNamespace(BLUR="blur")
    consts.Camera = types.SimpleNamespace(FRONT="front")
    consts.Lidar = types.SimpleNamespace(VELODYNE="velodyne")
    consts.Radar = types.SimpleNamespace(FRONT="front")

    zod_mod = types.ModuleType("zod")

    class ZodSequences:
        def __init__(self, dataset_root, version):
            self._root = dataset_root

        def __getitem__(self, seq_id):
            return _Seq(self._root)

    zod_mod.ZodSequences = ZodSequences
    monkeypatch.setitem(sys.modules, "zod", zod_mod)
    monkeypatch.setitem(sys.modules, "zod.constants", consts)

    # sequence-level radar npy: [timestamp, x, y, z, snr, range_rate, mode, quality]
    rd = tmp_path / "sequences" / "000581" / "radar_front"
    rd.mkdir(parents=True)
    rows = []
    for i, t in enumerate((100.2, 101.2)):
        for q in range(5):  # qualities 0..4; threshold 3 keeps 0,1,2
            rows.append([t, 10.0 + q, q * 0.5, 0.3, 20.0, -1.0, 0, q])
    np.save(rd / "radar.npy", np.asarray(rows))
    return tmp_path


def test_zod_parser(mock_zod):
    from neuradar_tpu.data.dataparsers.zod import ZodDataParserConfig

    cfg = ZodDataParserConfig(sequence="000581", data=str(mock_zod), add_missing_points=False)
    out = cfg.setup().get_dataparser_outputs()

    # hood crop: 756 - 750 = 6 rows
    assert out.images.shape == (4, 6, 32, 3)
    assert out.image_size == (6, 32)
    np.testing.assert_allclose(out.intrinsics[0], [120.0, 121.0, 16.0, 400.0])
    # fisheye camera with padded 6-slot distortion
    from neuradar_tpu.cameras.cameras import CameraType

    assert (out.camera_type == int(CameraType.FISHEYE)).all()
    assert out.distortion_params.shape == (4, 6)
    # lidar packs [x y z intensity dt channel]; ego points removed
    assert out.lidar_points[0].shape[1] == 6
    assert (np.abs(out.lidar_points[0][:, 4]) < 0.1).all()  # per-point dt around scan median
    # radar: 2 scans, quality<3 keeps 3 of 5 points each
    assert len(out.radar_points) == 2 and all(len(p) == 3 for p in out.radar_points)
    assert out.radar_fov["min_azimuth"] == -0.80
    # actor trajectory parsed, wlh->lwh dims reorder: (l, w, h)
    assert len(out.trajectories) == 1
    traj = out.trajectories[0]
    assert traj["symmetric"] and not traj["deformable"]
    np.testing.assert_allclose(traj["dims"], [4.5, 2.0, 1.6])
    assert traj["poses"].shape == (3, 4, 4)
    # times zero-based, duration covers the sequence
    assert out.camera_times.min() == 0.0 and out.duration >= 3.0
    # ego motion recentering: camera x positions strictly increasing (1 m/s)
    dx = np.diff(out.camera_to_worlds[:, 0, 3])
    assert (dx > 0.9).all() and (dx < 1.1).all()
