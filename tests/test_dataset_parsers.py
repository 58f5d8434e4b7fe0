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
        cam2odom = np.eye(4)
        cam2odom[:3, 3] = [fi * 1.0, 0.0, 0.0]
        # the real devkit pose json key (camelCase): the CAMERA pose in odom
        (root / "lidar" / "training" / "pose" / f"{fi:05d}.json").write_text(
            json.dumps({"odomToCamera": cam2odom.reshape(-1).tolist()})
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
    # pose chain: with identity lidar->cam extrinsic, lidar pose == camera
    # pose (pre-axis-fix) and both advance 1 m/frame along +x
    np.testing.assert_allclose(
        out.lidar_to_worlds[1, :, 3] - out.lidar_to_worlds[0, :, 3], [1.0, 0.0, 0.0], atol=1e-6
    )
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
        obj = {"name": "Vehicle", "uuid": "actor-1", "pose": pose, "size": [4.5, 2.0, 1.6]}  # devkit (l, w, h)
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
    # actor dims in the reference's wlh order (zod_dataparser.py:507)
    assert len(out.trajectories) == 1
    traj = out.trajectories[0]
    assert traj["symmetric"] and not traj["deformable"]
    np.testing.assert_allclose(traj["dims"], [2.0, 4.5, 1.6])
    assert traj["poses"].shape == (3, 4, 4)
    # times zero-based, duration covers the sequence
    assert out.camera_times.min() == 0.0 and out.duration >= 3.0
    # ego motion recentering: camera x positions strictly increasing (1 m/s)
    dx = np.diff(out.camera_to_worlds[:, 0, 3])
    assert (dx > 0.9).all() and (dx < 1.1).all()


# --------------------------------------------------------- KITTI MOT (files)


def test_kittimot_parser(tmp_path):
    import PIL.Image

    from neuradar_tpu.data.dataparsers.kittimot import KittiMotDataParserConfig

    root = tmp_path / "training"
    seq = "0006"
    for sub in (f"image_02/{seq}", f"velodyne/{seq}", "calib", "oxts", "label_02"):
        (root / sub).mkdir(parents=True)
    P2 = np.zeros((3, 4))
    P2[0, 0], P2[1, 1], P2[0, 2], P2[1, 2] = 720.0, 721.0, 60.0, 18.0
    Tr = np.hstack([np.eye(3), np.array([[0.1], [0.0], [-0.05]])])
    (root / "calib" / f"{seq}.txt").write_text(
        "P2: " + " ".join(map(str, P2.reshape(-1))) + "\n"
        + "Tr_velo_cam " + " ".join(map(str, Tr.reshape(-1))) + "\n"
    )
    # 4 oxts lines: constant lat step -> forward motion in mercator
    oxts = []
    for i in range(4):
        oxts.append(f"{49.0 + i * 1e-5} 8.43 112.8 0.0 0.0 0.0 " + " ".join(["0"] * 24))
    (root / "oxts" / f"{seq}.txt").write_text("\n".join(oxts))
    rng = np.random.RandomState(0)
    for i in range(4):
        # vary sizes by a pixel to exercise the common-size crop
        h, w = 36 + (i % 2), 120
        PIL.Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            root / "image_02" / seq / f"{i:06d}.png")
        rng.randn(64, 4).astype(np.float32).tofile(root / "velodyne" / seq / f"{i:06d}.bin")
    # tracklets: one Car across 3 frames, one ignored type, one single-frame track
    lines = []
    for fr in range(3):
        lines.append(f"{fr} 1 Car 0 0 0 0 0 0 0 1.5 1.7 4.0 {2.0 + fr} 1.0 8.0 0.3")
    lines.append("0 2 DontCare 0 0 0 0 0 0 0 1 1 1 0 0 0 0")
    lines.append("1 3 Pedestrian 0 0 0 0 0 0 0 1.8 0.6 0.6 1 1 5 0")
    (root / "label_02" / f"{seq}.txt").write_text("\n".join(lines))

    out = KittiMotDataParserConfig(sequence=seq, data=str(tmp_path)).setup().get_dataparser_outputs()
    assert out.images.shape == (4, 36, 120, 3)  # cropped to common min size
    np.testing.assert_allclose(out.intrinsics[0], [720.0, 721.0, 60.0, 18.0])
    assert len(out.lidar_points) == 4 and out.lidar_points[0].shape[1] == 6
    # ego moves: consecutive camera positions differ
    assert np.linalg.norm(np.diff(out.camera_to_worlds[:, :, 3], axis=0), axis=-1).min() > 1e-3
    # one Car track (3 frames); single-frame Pedestrian dropped, DontCare ignored
    assert len(out.trajectories) == 1
    tr = out.trajectories[0]
    assert tr["symmetric"] and tr["poses"].shape == (3, 4, 4)
    np.testing.assert_allclose(tr["dims"], [1.7, 4.0, 1.5])  # reference wlh order
    # pose chain includes cam->velo: with Tr translation (0.1, 0, -0.05),
    # the box z (up in our frame) reflects the camera height offset
    assert np.isfinite(tr["poses"]).all()
    assert len(out.radar_points) == 0


# ----------------------------------------------------------- PandaSet (files)


def test_pandaset_parser(tmp_path):
    import pandas as pd
    import PIL.Image

    from neuradar_tpu.data.dataparsers.pandaset import PandasetDataParserConfig

    seq = tmp_path / "001"
    cam = seq / "camera" / "front_camera"
    lid = seq / "lidar"
    cub = seq / "annotations" / "cuboids"
    for d in (cam, lid, cub):
        d.mkdir(parents=True)

    def pose_dict(x, heading=(1.0, 0.0, 0.0, 0.0)):
        w, qx, qy, qz = heading
        return {"position": {"x": x, "y": 0.0, "z": 1.5},
                "heading": {"w": w, "x": qx, "y": qy, "z": qz}}

    n = 4
    rng = np.random.RandomState(0)
    (cam / "poses.json").write_text(json.dumps([pose_dict(i * 2.0) for i in range(n)]))
    (cam / "intrinsics.json").write_text(json.dumps({"fx": 400.0, "fy": 401.0, "cx": 20.0, "cy": 14.0}))
    (cam / "timestamps.json").write_text(json.dumps([100.0 + 0.1 * i for i in range(n)]))
    for i in range(n):
        PIL.Image.fromarray(rng.randint(0, 255, (28, 40, 3), np.uint8)).save(cam / f"{i:02d}.jpg")

    (lid / "poses.json").write_text(json.dumps([pose_dict(i * 2.0) for i in range(n)]))
    (lid / "timestamps.json").write_text(json.dumps([100.05 + 0.1 * i for i in range(n)]))
    for i in range(n):
        pts_world = rng.randn(32, 3) * 10
        pd.DataFrame({
            "x": pts_world[:, 0], "y": pts_world[:, 1], "z": pts_world[:, 2],
            "i": rng.randint(0, 255, 32).astype(float),
            "t": 100.05 + 0.1 * i + rng.rand(32) * 0.02,
            "d": rng.randint(0, 64, 32).astype(float),
        }).to_pickle(lid / f"{i:02d}.pkl.gz")
        pd.DataFrame({
            "uuid": ["c1", "px"], "label": ["Car", "Cones"],
            "yaw": [0.3, 0.0],
            "position.x": [5.0 + i, 0.0], "position.y": [1.0, 0.0], "position.z": [0.5, 0.0],
            "dimensions.x": [2.0, 1.0], "dimensions.y": [4.5, 1.0], "dimensions.z": [1.6, 1.0],
        }).to_pickle(cub / f"{i:02d}.pkl.gz")

    out = PandasetDataParserConfig(sequence="001", data=str(tmp_path)).setup().get_dataparser_outputs()
    assert out.images.shape == (4, 28, 40, 3)
    np.testing.assert_allclose(out.intrinsics[0], [400.0, 401.0, 20.0, 14.0])
    # rolling shutter metadata present: velocities ~ 2m / 0.1s = 20 m/s in x
    assert out.camera_velocities is not None and out.rolling_shutter_offsets is not None
    np.testing.assert_allclose(out.camera_velocities[:, 0], 20.0, rtol=1e-4)
    np.testing.assert_allclose(out.rolling_shutter_offsets[0], [-0.025, 0.025], atol=1e-6)
    # lidar: world->sensor transform applied, 6 columns
    assert out.lidar_points[0].shape == (32, 6)
    # one Car trajectory across 4 frames; 'Cones' filtered
    assert len(out.trajectories) == 1
    tr = out.trajectories[0]
    assert tr["poses"].shape == (4, 4, 4) and tr["symmetric"]
    np.testing.assert_allclose(tr["dims"], [4.5, 2.0, 1.6])


# --------------------------------------------------------- nuScenes (mock devkit)


@pytest.fixture()
def mock_nuscenes(monkeypatch, tmp_path):
    import PIL.Image

    rng = np.random.RandomState(0)
    n_samples = 3

    # on-disk blobs the parser reads via get_sample_data_path
    lidar_files, image_files = [], []
    for i in range(n_samples):
        lf = tmp_path / f"lidar_{i}.bin"
        rng.randn(48, 5).astype(np.float32).tofile(lf)
        lidar_files.append(str(lf))
        imf = tmp_path / f"cam_{i}.jpg"
        PIL.Image.fromarray(rng.randint(0, 255, (20, 30, 3), np.uint8)).save(imf)
        image_files.append(str(imf))

    # table records keyed like the devkit's nusc.get(table, token)
    records = {}

    def put(table, token, rec):
        records[(table, token)] = rec
        return token

    for i in range(n_samples):
        put("ego_pose", f"ego{i}", {"rotation": [1, 0, 0, 0], "translation": [i * 2.0, 0, 0]})
        put("calibrated_sensor", f"lcal{i}", {"rotation": [1, 0, 0, 0], "translation": [0, 0, 1.8]})
        put("calibrated_sensor", f"ccal{i}", {
            "rotation": [1, 0, 0, 0], "translation": [0.5, 0, 1.4],
            "camera_intrinsic": [[500.0, 0, 15.0], [0, 501.0, 10.0], [0, 0, 1]],
        })
        put("sample_data", f"lsd{i}", {"token": f"lsd{i}", "ego_pose_token": f"ego{i}",
                                       "calibrated_sensor_token": f"lcal{i}",
                                       "timestamp": (100 + i * 0.5) * 1e6})
        put("sample_data", f"csd{i}", {"token": f"csd{i}", "ego_pose_token": f"ego{i}",
                                       "calibrated_sensor_token": f"ccal{i}",
                                       "timestamp": (100 + i * 0.5) * 1e6})
        put("sample_annotation", f"ann{i}", {
            "category_name": "vehicle.car.something", "instance_token": "inst1",
            "rotation": [1, 0, 0, 0], "translation": [8.0 + i, 2.0, 0.0], "size": [2.0, 4.4, 1.5],
        })
        put("sample_annotation", f"ign{i}", {
            "category_name": "movable_object.cone", "instance_token": "inst2",
            "rotation": [1, 0, 0, 0], "translation": [0, 0, 0], "size": [1, 1, 1],
        })
        put("sample", f"s{i}", {
            "timestamp": (100 + i * 0.5) * 1e6,
            "data": {"LIDAR_TOP": f"lsd{i}", "CAM_FRONT": f"csd{i}"},
            "anns": [f"ann{i}", f"ign{i}"],
            "next": f"s{i + 1}" if i + 1 < n_samples else "",
        })

    data_paths = {f"lsd{i}": lidar_files[i] for i in range(n_samples)}
    data_paths.update({f"csd{i}": image_files[i] for i in range(n_samples)})

    class NuScenes:
        def __init__(self, version, dataroot, verbose=False):
            self.scene = [{"name": "scene-0103", "first_sample_token": "s0"}]

        def get(self, table, token):
            return records[(table, token)]

        def get_sample_data_path(self, token):
            return data_paths[token]

    nusc_pkg = types.ModuleType("nuscenes")
    nusc_mod = types.ModuleType("nuscenes.nuscenes")
    nusc_mod.NuScenes = NuScenes
    nusc_pkg.nuscenes = nusc_mod

    pyq = types.ModuleType("pyquaternion")

    class Quaternion:
        def __init__(self, wxyz):
            w, x, y, z = wxyz
            self.rotation_matrix = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])

    pyq.Quaternion = Quaternion
    monkeypatch.setitem(sys.modules, "nuscenes", nusc_pkg)
    monkeypatch.setitem(sys.modules, "nuscenes.nuscenes", nusc_mod)
    monkeypatch.setitem(sys.modules, "pyquaternion", pyq)
    return tmp_path


def test_nuscenes_parser(mock_nuscenes):
    from neuradar_tpu.data.dataparsers.nuscenes import NuScenesDataParserConfig

    cfg = NuScenesDataParserConfig(sequence="scene-0103", data=str(mock_nuscenes))
    out = cfg.setup().get_dataparser_outputs()
    assert out.images.shape == (3, 20, 30, 3)
    np.testing.assert_allclose(out.intrinsics[0], [500.0, 501.0, 15.0, 10.0])
    # lidar: 5-col nuScenes packs to 6-col [xyz intensity time ring]
    assert out.lidar_points[0].shape == (48, 6)
    assert (out.lidar_points[0][:, 3] <= 1.0).all()  # intensity scaled /255
    # samples chained via 'next'; timestamps at 2 Hz, zero-based
    np.testing.assert_allclose(out.camera_times, [0.0, 0.5, 1.0], atol=1e-6)
    # car tracked across all samples, cone ignored; wlh -> lwh
    assert len(out.trajectories) == 1
    np.testing.assert_allclose(out.trajectories[0]["dims"], [4.4, 2.0, 1.5])
    # camera offset from ego (+0.5 x in calib): cam x = ego x + 0.5, recentered
    dx = np.diff(out.camera_to_worlds[:, 0, 3])
    np.testing.assert_allclose(dx, 2.0, atol=1e-5)


# --------------------------------------------------------- Argoverse 2 (mock av2)


@pytest.fixture()
def mock_av2(monkeypatch, tmp_path):
    import pandas as pd
    import PIL.Image
    import pyarrow.feather as feather

    rng = np.random.RandomState(0)
    log = tmp_path / "log-0001"
    cam = "ring_front_center"
    (log / "sensors" / "cameras" / cam).mkdir(parents=True)
    (log / "sensors" / "lidar").mkdir(parents=True)
    (log / "calibration").mkdir(parents=True)

    n = 3
    ts_ns = [int((100 + i * 0.1) * 1e9) for i in range(n)]
    for t in ts_ns:
        PIL.Image.fromarray(rng.randint(0, 255, (18, 26, 3), np.uint8)).save(
            log / "sensors" / "cameras" / cam / f"{t}.jpg")
        feather.write_feather(pd.DataFrame({
            "x": rng.randn(40), "y": rng.randn(40), "z": rng.randn(40),
            "intensity": rng.randint(0, 255, 40).astype(float),
            "offset_ns": rng.randint(0, int(5e7), 40).astype(float),
            "laser_number": rng.randint(0, 32, 40).astype(float),
        }), log / "sensors" / "lidar" / f"{t}.feather")

    feather.write_feather(pd.DataFrame({
        "sensor_name": [cam], "fx_px": [800.0], "fy_px": [801.0], "cx_px": [13.0], "cy_px": [9.0],
    }), log / "calibration" / "intrinsics.feather")
    feather.write_feather(pd.DataFrame({
        "sensor_name": [cam], "qw": [1.0], "qx": [0.0], "qy": [0.0], "qz": [0.0],
        "tx_m": [1.2], "ty_m": [0.0], "tz_m": [1.5],
    }), log / "calibration" / "egovehicle_SE3_sensor.feather")

    ann_rows = []
    for t in ts_ns:
        ann_rows.append({"category": "REGULAR_VEHICLE", "track_uuid": "veh-1",
                         "qw": 1.0, "qx": 0.0, "qy": 0.0, "qz": 0.0,
                         "tx_m": 10.0, "ty_m": 2.0, "tz_m": 0.4,
                         "length_m": 4.7, "width_m": 1.9, "height_m": 1.5,
                         "timestamp_ns": t})
        ann_rows.append({"category": "TRAFFIC_CONE", "track_uuid": "cone-1",
                         "qw": 1.0, "qx": 0.0, "qy": 0.0, "qz": 0.0,
                         "tx_m": 0.0, "ty_m": 0.0, "tz_m": 0.0,
                         "length_m": 0.3, "width_m": 0.3, "height_m": 0.7,
                         "timestamp_ns": t})
    import pandas as pd  # noqa: F811
    feather.write_feather(pd.DataFrame(ann_rows), log / "annotations.feather")

    # --- mocked av2 modules
    def quat_to_mat(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    class _SE3:
        def __init__(self, t):
            self.transform_matrix = np.eye(4)
            self.transform_matrix[0, 3] = t  # ego drives +x

    def read_city_SE3_ego(log_dir):
        return {t: _SE3((t / 1e9 - 100.0) * 5.0) for t in ts_ns}

    mods = {
        "av2": types.ModuleType("av2"),
        "av2.datasets": types.ModuleType("av2.datasets"),
        "av2.datasets.sensor": types.ModuleType("av2.datasets.sensor"),
        "av2.datasets.sensor.sensor_dataloader": types.ModuleType("av2.datasets.sensor.sensor_dataloader"),
        "av2.structures": types.ModuleType("av2.structures"),
        "av2.structures.cuboid": types.ModuleType("av2.structures.cuboid"),
        "av2.utils": types.ModuleType("av2.utils"),
        "av2.utils.io": types.ModuleType("av2.utils.io"),
        "av2.geometry": types.ModuleType("av2.geometry"),
        "av2.geometry.se3": types.ModuleType("av2.geometry.se3"),
        "av2.geometry.geometry": types.ModuleType("av2.geometry.geometry"),
    }
    mods["av2.datasets.sensor.sensor_dataloader"].SensorDataloader = object
    mods["av2.structures.cuboid"].CuboidList = object
    mods["av2.utils.io"].read_city_SE3_ego = read_city_SE3_ego
    mods["av2.utils.io"].read_feather = feather.read_feather
    mods["av2.geometry.se3"].SE3 = _SE3
    mods["av2.geometry.geometry"].quat_to_mat = quat_to_mat
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return tmp_path


def test_argoverse2_parser(mock_av2):
    from neuradar_tpu.data.dataparsers.argoverse2 import Argoverse2DataParserConfig

    cfg = Argoverse2DataParserConfig(sequence="log-0001", data=str(mock_av2))
    out = cfg.setup().get_dataparser_outputs()
    assert out.images.shape == (3, 18, 26, 3)
    np.testing.assert_allclose(out.intrinsics[0], [800.0, 801.0, 13.0, 9.0])
    # lidar 6-col with offset_ns -> seconds and intensity /255
    assert out.lidar_points[0].shape == (40, 6)
    assert out.lidar_points[0][:, 4].max() < 0.06
    assert out.lidar_points[0][:, 3].max() <= 1.0
    # vehicle tracked, cone filtered; av2 dims already (l, w, h)
    assert len(out.trajectories) == 1
    np.testing.assert_allclose(out.trajectories[0]["dims"], [4.7, 1.9, 1.5])
    # ego at 5 m/s: consecutive camera x deltas = 0.5 m
    np.testing.assert_allclose(np.diff(out.camera_to_worlds[:, 0, 3]), 0.5, atol=1e-5)


# ------------------------------------------------------------- WOD (mock tf+pb)


class _WodVec:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _WodFrameData:
    """Pickleable stand-in for a waymo dataset_pb2.Frame."""

    def __init__(self, i):
        rng = np.random.RandomState(i)
        ego = np.eye(4)
        ego[0, 3] = i * 1.5
        self.pose = _WodVec(transform=ego.reshape(-1).tolist())
        self.timestamp_micros = int((200.0 + i * 0.1) * 1e6)
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.fromarray(rng.randint(0, 255, (22, 34, 3), np.uint8)).save(buf, format="JPEG")
        self.images = [_WodVec(
            name=1,  # FRONT
            image=buf.getvalue(),
            velocity=_WodVec(v_x=15.0, v_y=0.0, v_z=0.0),
            camera_trigger_time=200.0 + i * 0.1,
            camera_readout_done_time=200.0 + i * 0.1 + 0.04,
        )]
        extr = np.eye(4)
        self.context = _WodVec(camera_calibrations=[_WodVec(
            name=1, extrinsic=_WodVec(transform=extr.reshape(-1).tolist()),
            intrinsic=[600.0, 601.0, 17.0, 11.0, 0, 0, 0, 0, 0],
            rolling_shutter_direction=2,  # LEFT_TO_RIGHT (column readout)
        )])
        self.laser_labels = [
            _WodVec(id="veh-1", type=1,
                    box=_WodVec(center_x=12.0, center_y=3.0, center_z=0.6, heading=0.2,
                                length=4.9, width=2.1, height=1.7)),
            _WodVec(id="sign-1", type=3,
                    box=_WodVec(center_x=0, center_y=0, center_z=0, heading=0,
                                length=1, width=1, height=1)),
        ]
        self._points = rng.randn(56, 3).astype(np.float32) * 8

    def ParseFromString(self, b):
        import pickle

        self.__dict__.update(pickle.loads(b).__dict__)


@pytest.fixture()
def mock_wod(monkeypatch, tmp_path):
    import pickle

    frames = [_WodFrameData(i) for i in range(3)]
    payloads = [pickle.dumps(f) for f in frames]
    rec = tmp_path / "segment-000.tfrecord"
    rec.write_bytes(b"placeholder")

    class _Rec:
        def __init__(self, b):
            self._b = b

        def numpy(self):
            return self._b

    tf = types.ModuleType("tensorflow")
    tf.data = types.SimpleNamespace(TFRecordDataset=lambda path, compression_type="": [
        _Rec(b) for b in payloads])

    def decode_jpeg(img_bytes):
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(img_bytes)))

    tf.io = types.SimpleNamespace(decode_jpeg=decode_jpeg)

    wod_pkg = types.ModuleType("waymo_open_dataset")
    pb = types.ModuleType("waymo_open_dataset.dataset_pb2")

    class Frame(_WodFrameData):
        def __init__(self):  # empty until ParseFromString
            pass

    pb.Frame = Frame
    utils_pkg = types.ModuleType("waymo_open_dataset.utils")
    fu = types.ModuleType("waymo_open_dataset.utils.frame_utils")
    fu.parse_range_image_and_camera_projection = lambda frame: (None, None, None, None)
    def _convert(frame, ri, cp, pose, keep_polar_features=False):
        pts = frame._points
        if keep_polar_features:
            rng_col = np.linalg.norm(pts, axis=1, keepdims=True)
            inten = np.linspace(0.0, 50.0, len(pts))[:, None]  # raw intensities
            pts = np.hstack([rng_col, inten, np.zeros_like(rng_col), pts])
        return [pts], None

    fu.convert_range_image_to_point_cloud = _convert
    wod_pkg.dataset_pb2 = pb
    utils_pkg.frame_utils = fu

    for name, mod in {
        "tensorflow": tf,
        "waymo_open_dataset": wod_pkg,
        "waymo_open_dataset.dataset_pb2": pb,
        "waymo_open_dataset.utils": utils_pkg,
        "waymo_open_dataset.utils.frame_utils": fu,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return tmp_path


def test_wod_parser(mock_wod):
    from neuradar_tpu.data.dataparsers.wod import WodDataParserConfig

    cfg = WodDataParserConfig(sequence="segment-000.tfrecord", data=str(mock_wod))
    out = cfg.setup().get_dataparser_outputs()
    assert out.images.shape == (3, 22, 34, 3)
    np.testing.assert_allclose(out.intrinsics[0], [600.0, 601.0, 17.0, 11.0])
    # rolling shutter from trigger/readout times: 40 ms window
    np.testing.assert_allclose(out.rolling_shutter_offsets[0], [-0.02, 0.02], atol=1e-6)
    np.testing.assert_allclose(out.camera_velocities[0], [15.0, 0.0, 0.0])
    # LEFT_TO_RIGHT (=2) readout: column-wise shutter flag set (reference
    # wod_dataparser.py:136 'Horizontal')
    assert out.rolling_shutter_horizontal is not None and bool(out.rolling_shutter_horizontal[0])
    assert out.lidar_points[0].shape == (56, 6)
    # intensity carried from the range image (min-max normalized to [0, 1]),
    # not zero-filled (regression)
    inten = out.lidar_points[0][:, 3]
    assert inten.min() >= 0.0 and inten.max() <= 1.0 and inten.std() > 0.01
    # vehicle tracked (type 1), sign (type 3) filtered; dims reordered to
    # (w, l, h) with the pose yawed -90deg, matching every other parser's
    # wlh contract (reference wod_dataparser.py:257-269)
    assert len(out.trajectories) == 1
    np.testing.assert_allclose(out.trajectories[0]["dims"], [2.1, 4.9, 1.7])
    # heading 0.2 composed with Rz(-90deg): box x axis = Rz(0.2 - pi/2) e_x
    box_x = out.trajectories[0]["poses"][0][:3, 0]
    np.testing.assert_allclose(box_x, [np.sin(0.2), -np.cos(0.2), 0.0], atol=1e-5)
    # ego at 1.5 m per frame
    np.testing.assert_allclose(np.diff(out.camera_to_worlds[:, 0, 3]), 1.5, atol=1e-4)
