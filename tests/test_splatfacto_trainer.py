"""Splatfacto trainer end-to-end smoke (synthetic scene, tiny config)."""

import numpy as np

from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig
from neuradar_tpu.engine.splatfacto_trainer import SplatfactoTrainer, SplatfactoTrainerConfig
from neuradar_tpu.models.splatfacto import SplatfactoConfig


def test_splatfacto_trains(tmp_path):
    outputs = SyntheticDataParser(
        SyntheticDataParserConfig(num_frames=6, image_height=48, image_width=64, lidar_points_per_scan=2048)
    ).get_dataparser_outputs()
    cfg = SplatfactoTrainerConfig(
        model=SplatfactoConfig(max_gaussians=2048, tile_top_k=64, refine_every=25, warmup_steps=20),
        max_num_iterations=60,
        steps_per_log=20,
        output_dir=str(tmp_path),
    )
    trainer = SplatfactoTrainer(cfg, dataparser_outputs=outputs)
    trainer.setup()
    metrics = trainer.train(60)
    assert np.isfinite(metrics["loss"])
    assert metrics["num_gaussians"] > 0
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
