"""Method registry: named TrainerConfig presets.

cf. reference nerfstudio/configs/method_configs.py:53-528. Method names match
the reference's public CLI surface (neuradar, neurad, neurad-scaleopt, plus
scaled variants); 'neuradar-synthetic' adds a data-free smoke/bench preset.
External methods can register through the neuradar_tpu.plugins entry-point
mechanism (plugins/registry.py).
"""

from __future__ import annotations

from typing import Callable, Dict

from neuradar_tpu.cameras.camera_optimizers import CameraOptimizerConfig, ScaledCameraOptimizerConfig
from neuradar_tpu.data.datamanager import ADDataManagerConfig
from neuradar_tpu.engine.optimizers import default_optimizer_groups
from neuradar_tpu.engine.trainer import TrainerConfig
from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipelineConfig

method_configs: Dict[str, Callable[[], TrainerConfig]] = {}


def _neuradar() -> TrainerConfig:
    """cf. method_configs.py:367-413 (the 'neuradar' preset)."""
    from neuradar_tpu.data.dataparsers.zod import ZodDataParserConfig

    cfg = TrainerConfig(
        method_name="neuradar",
        steps_per_eval_batch=500,
        steps_per_eval_image=2000,
        steps_per_eval_all_images=20000,
        steps_per_eval_all_radars=20000,
        steps_per_save=10000,
        max_num_iterations=20001,
        mixed_precision=True,
        pipeline=ADNeuRadarPipelineConfig(datamanager=ADDataManagerConfig()),
        optimizers=default_optimizer_groups(20001),
        dataparser=ZodDataParserConfig(add_missing_points=True),
    )
    cfg.pipeline.model.camera_optimizer = CameraOptimizerConfig(mode="off")
    # TPU memory tuning at the full reference batch (112k rays): chunk the
    # NFF core and run gathers/MLPs in bf16 — without these the padded
    # [rays, samples] intermediates exceed HBM (see models/neuradar.py)
    cfg.pipeline.model.nff_chunks = 8
    cfg.pipeline.model.compute_dtype = "bfloat16"
    return cfg


def _neuradar_vod() -> TrainerConfig:
    from neuradar_tpu.data.dataparsers.vod import VodDataParserConfig

    cfg = _neuradar()
    cfg.method_name = "neuradar-vod"
    cfg.dataparser = VodDataParserConfig()
    return cfg


def _neuradar_synthetic() -> TrainerConfig:
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig

    cfg = TrainerConfig(
        method_name="neuradar-synthetic",
        steps_per_eval_batch=500,
        steps_per_eval_image=0,
        steps_per_eval_all_images=2000,
        steps_per_eval_all_radars=2000,
        steps_per_save=1000,
        max_num_iterations=2001,
        pipeline=ADNeuRadarPipelineConfig(datamanager=ADDataManagerConfig()),
        optimizers=default_optimizer_groups(2001),
        dataparser=SyntheticDataParserConfig(),
    )
    cfg.pipeline.model.loss.vgg_mult = 0.0
    return cfg


def _neurad() -> TrainerConfig:
    """Camera+lidar only (radar path disabled; cf. method_configs 'neurad')."""
    cfg = _neuradar()
    cfg.method_name = "neurad"
    cfg.pipeline.datamanager.num_radar_scans = 0
    cfg.pipeline.model.camera_optimizer = CameraOptimizerConfig(mode="SO3xR3")
    return cfg


def _neurad_scaleopt() -> TrainerConfig:
    """cf. method_configs.py:417-427 (scaled camera optimizer for nuscenes)."""
    cfg = _neurad()
    cfg.method_name = "neurad-scaleopt"
    cfg.pipeline.model.camera_optimizer = ScaledCameraOptimizerConfig(
        mode="SO3xR3",
        weights=(1.0, 1.0, 0.01, 0.01, 0.01, 1.0),
        trans_l2_penalty=(1e-2, 1e-2, 1e-3),
    )
    return cfg


def _scaled(base: Callable[[], TrainerConfig], scale: float, newname: str) -> Callable[[], TrainerConfig]:
    """cf. _scaled_neurad_training (method_configs.py:429-442)."""

    def make() -> TrainerConfig:
        cfg = base()
        cfg.method_name = newname
        cfg.max_num_iterations = int((cfg.max_num_iterations - 1) * scale + 1)
        cfg.steps_per_eval_batch = int(cfg.steps_per_eval_batch * scale)
        cfg.steps_per_eval_image = int(cfg.steps_per_eval_image * scale)
        cfg.steps_per_eval_all_images = int(cfg.steps_per_eval_all_images * scale)
        cfg.steps_per_eval_all_radars = int(cfg.steps_per_eval_all_radars * scale)
        cfg.steps_per_save = int(cfg.steps_per_save * scale)
        # stretch the existing schedules IN PLACE (reference
        # _scaled_neurad_training:439-441) — rebuilding the groups would
        # discard base()'s lr customizations (e.g. neurader's halved lrs)
        for g in cfg.optimizers.values():
            if g.scheduler is not None:
                g.scheduler.max_steps = int(g.scheduler.max_steps * scale)
                g.scheduler.warmup_steps = int(g.scheduler.warmup_steps * scale)
        return cfg

    return make


def _neurad_on(dataparser_factory, name: str) -> Callable[[], TrainerConfig]:
    def make() -> TrainerConfig:
        cfg = _neurad()
        cfg.method_name = name
        cfg.dataparser = dataparser_factory()
        return cfg

    return make


def _nuscenes_parser():
    from neuradar_tpu.data.dataparsers.nuscenes import NuScenesDataParserConfig

    return NuScenesDataParserConfig()


def _pandaset_parser():
    from neuradar_tpu.data.dataparsers.pandaset import PandasetDataParserConfig

    return PandasetDataParserConfig()


def _kittimot_parser():
    from neuradar_tpu.data.dataparsers.kittimot import KittiMotDataParserConfig

    return KittiMotDataParserConfig()


def _neuradar_set() -> TrainerConfig:
    """The paper's DETR set-based decoder variant (BASELINE.json config[4])."""
    cfg = _neuradar()
    cfg.method_name = "neuradar-set"
    cfg.pipeline.model.radar_decoder_type = "set"
    cfg.pipeline.model.loss.radar_set_loss = "detr"
    return cfg


method_configs["neuradar"] = _neuradar
method_configs["neuradar-set"] = _neuradar_set
method_configs["neuradar-vod"] = _neuradar_vod
method_configs["neuradar-synthetic"] = _neuradar_synthetic
method_configs["neurad"] = _neurad
def _with_name(cfg: TrainerConfig, name: str) -> TrainerConfig:
    cfg.method_name = name
    return cfg


def _paperize(cfg: TrainerConfig, name: str) -> TrainerConfig:
    """cf. method_configs.py:476-485: paper settings — no temporal
    appearance, no actor flip augmentation."""
    cfg.method_name = name
    cfg.pipeline.model.use_temporal_appearance = False
    for f in (cfg.pipeline.model.field, cfg.pipeline.model.sampling.proposal_field_1,
              cfg.pipeline.model.sampling.proposal_field_2):
        f.grid.actor.flip_prob = 0.0
    return cfg


def _scale_camera_optimizer(cfg: TrainerConfig) -> TrainerConfig:
    """cf. method_configs.py:417-427,458-470: the *-scaleopt variants weight
    z-rot/x-trans/y-trans down 100x with per-axis translation L2."""
    cfg.pipeline.model.camera_optimizer = ScaledCameraOptimizerConfig(
        mode="SO3xR3",
        weights=(1.0, 1.0, 0.01, 0.01, 0.01, 1.0),
        trans_l2_penalty=(1e-2, 1e-2, 1e-3),
    )
    return cfg


def _neurader() -> TrainerConfig:
    """cf. method_configs.py:446-456 ('Bigger, better, longer, stronger'):
    2.5x schedule, halved learning rates, doubled static grid resolution,
    +1 hashmap bit on every grid."""
    cfg = _scaled(_neurad, 2.5, "neurader")()
    for g in cfg.optimizers.values():
        g.optimizer.lr *= 0.5
        if g.scheduler is not None:
            g.scheduler.lr_final *= 0.5
    m = cfg.pipeline.model
    for f in (m.field, m.sampling.proposal_field_1, m.sampling.proposal_field_2):
        f.grid.static.max_res *= 2
        f.grid.static.base_res *= 2
        f.grid.static.log2_hashmap_size += 1
        f.grid.actor.log2_hashmap_size += 1
    return cfg


def _neuradest() -> TrainerConfig:
    """cf. method_configs.py:470: neurader stretched another 3x."""
    cfg = _scaled(_neurader, 3.0, "neuradest")()
    return cfg


method_configs["neurad-scaleopt"] = _neurad_scaleopt
method_configs["neurader"] = _neurader
method_configs["neuradest"] = _neuradest
method_configs["neurader-scaleopt"] = lambda: _scale_camera_optimizer(
    _with_name(_neurader(), "neurader-scaleopt"))
method_configs["neuradest-scaleopt"] = lambda: _scale_camera_optimizer(
    _with_name(_neuradest(), "neuradest-scaleopt"))
method_configs["neurad-paper"] = lambda: _paperize(_neurad(), "neurad-paper")
method_configs["neurad-2x-paper"] = lambda: _paperize(_neurader(), "neurad-2x-paper")
method_configs["neurad-nuscenes"] = _neurad_on(_nuscenes_parser, "neurad-nuscenes")
method_configs["neurad-pandaset"] = _neurad_on(_pandaset_parser, "neurad-pandaset")
method_configs["neurad-kittimot"] = _neurad_on(_kittimot_parser, "neurad-kittimot")


def _av2_parser():
    from neuradar_tpu.data.dataparsers.argoverse2 import Argoverse2DataParserConfig

    return Argoverse2DataParserConfig()


def _wod_parser():
    from neuradar_tpu.data.dataparsers.wod import WodDataParserConfig

    return WodDataParserConfig()


method_configs["neurad-argoverse2"] = _neurad_on(_av2_parser, "neurad-argoverse2")
method_configs["neurad-wod"] = _neurad_on(_wod_parser, "neurad-wod")


def _splatfacto():
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neuradar_tpu.engine.splatfacto_trainer import SplatfactoTrainerConfig

    return SplatfactoTrainerConfig(dataparser=SyntheticDataParserConfig())


def _splatfacto_big():
    from neuradar_tpu.models.splatfacto import SplatfactoConfig

    cfg = _splatfacto()
    cfg.method_name = "splatfacto-big"
    # chunked tile scoring (models/splatfacto.py:rasterize) keeps HBM flat in
    # G, so capacity now reaches reference splatfacto scale on AD scenes
    cfg.model = SplatfactoConfig(max_gaussians=1_048_576, tile_top_k=512)
    return cfg


method_configs["splatfacto"] = _splatfacto
method_configs["splatfacto-big"] = _splatfacto_big


def _nerfacto():
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neuradar_tpu.engine.nerfacto_trainer import NerfactoTrainerConfig

    return NerfactoTrainerConfig(dataparser=SyntheticDataParserConfig())


def _lidar_nerfacto():
    from neuradar_tpu.models.nerfacto import NerfactoModelConfig

    cfg = _nerfacto()
    cfg.method_name = "lidar-nerfacto"
    cfg.model = NerfactoModelConfig(predict_lidar=True)
    return cfg


def _nerfacto_data():
    """Generic posed-image capture (COLMAP/polycam via transforms.json);
    point --dataparser.data at the processed directory."""
    from neuradar_tpu.data.dataparsers.nerfstudio_format import NerfstudioFormatDataParserConfig

    cfg = _nerfacto()
    cfg.method_name = "nerfacto-data"
    cfg.dataparser = NerfstudioFormatDataParserConfig()
    return cfg


def _nerfacto_big():
    """cf. method_configs.py:100-143 (nerfacto-big): longer schedule, wider
    MLPs, denser sampling, larger grid."""
    from neuradar_tpu.models.nerfacto import NerfactoModelConfig

    cfg = _nerfacto()
    cfg.method_name = "nerfacto-big"
    cfg.max_num_iterations = 100000
    cfg.model = NerfactoModelConfig(
        num_nerf_samples_per_ray=128, num_proposal_samples_per_ray=(512, 256),
        hidden_dim=128, hidden_dim_color=128, appearance_embedding_dim=128,
        max_res=4096, log2_hashmap_size=21,
    )
    return cfg


def _nerfacto_huge():
    """cf. method_configs.py:144-190 (nerfacto-huge)."""
    from neuradar_tpu.models.nerfacto import NerfactoModelConfig

    cfg = _nerfacto()
    cfg.method_name = "nerfacto-huge"
    cfg.max_num_iterations = 100000
    cfg.model = NerfactoModelConfig(
        num_nerf_samples_per_ray=64, num_proposal_samples_per_ray=(512, 512),
        hidden_dim=256, hidden_dim_color=256, appearance_embedding_dim=32,
        max_res=8192, log2_hashmap_size=21,
    )
    return cfg


method_configs["nerfacto"] = _nerfacto
method_configs["nerfacto-big"] = _nerfacto_big
method_configs["nerfacto-huge"] = _nerfacto_huge
method_configs["lidar-nerfacto"] = _lidar_nerfacto


def _nerfacto_lidar():
    # the reference registers this method as 'nerfacto-lidar'
    # (method_configs.py) — accept both spellings
    cfg = _lidar_nerfacto()
    cfg.method_name = "nerfacto-lidar"
    return cfg


method_configs["nerfacto-lidar"] = _nerfacto_lidar
method_configs["nerfacto-data"] = _nerfacto_data

method_descriptions = {
    "neuradar": "Joint camera+lidar+radar NeuRadar on ZOD.",
    "neuradar-set": "NeuRadar with the DETR set-based radar decoder + SetCriterion loss.",
    "neuradar-vod": "NeuRadar on View-of-Delft.",
    "neuradar-synthetic": "NeuRadar on the built-in synthetic scene (no dataset needed).",
    "neurad": "Camera+lidar NeuRAD.",
    "neurad-scaleopt": "NeuRAD with scaled camera optimization.",
    "neurader": "NeuRAD 2.5x schedule, halved lrs, doubled grids (reference 'bigger better longer stronger').",
    "neuradest": "neurader stretched another 3x.",
    "neurader-scaleopt": "neurader with scaled camera optimization.",
    "neuradest-scaleopt": "neuradest with scaled camera optimization.",
    "neurad-paper": "Paper settings: no temporal appearance, no actor flip.",
    "neurad-2x-paper": "Paper settings at the neurader scale.",
    "nerfacto-big": "Nerfacto, 100k iters, wider MLPs, larger grid.",
    "nerfacto-huge": "Nerfacto, 100k iters, widest MLPs, densest sampling.",
}


def get_method(name: str) -> TrainerConfig:
    if name not in method_configs:
        from neuradar_tpu.plugins.registry import discover_methods

        external = discover_methods()
        if name in external:
            return external[name]()
        raise KeyError(f"unknown method '{name}'; available: {sorted(method_configs)}")
    return method_configs[name]()
