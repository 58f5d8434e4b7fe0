"""Nerfacto/LidarNerfacto trainer wiring: a few steps on the synthetic scene
optimize the loss (cf. the reference's nerfacto + lidar_nerfacto methods)."""

import numpy as np

from neuradar_tpu.configs.method_configs import get_method
from neuradar_tpu.engine.nerfacto_trainer import NerfactoTrainer


def _small(cfg, tmp_path):
    cfg.output_dir = str(tmp_path)
    cfg.max_num_iterations = 30
    cfg.steps_per_log = 5
    cfg.steps_per_eval_batch = 0
    cfg.num_rgb_patches = 4
    cfg.patch_size = 8
    cfg.num_lidar_rays = 512
    cfg.warmup_steps = 8
    m = cfg.model
    m.num_proposal_samples_per_ray = (32, 16)
    m.num_nerf_samples_per_ray = 8
    m.log2_hashmap_size = 12
    m.num_levels = 4
    m.max_res = 256
    m.hidden_dim = m.hidden_dim_color = 16
    m.appearance_embedding_dim = 4
    return cfg


def _losses(trainer, iters=30):
    trainer.setup()
    losses = []
    orig = trainer.writer.put_scalars
    trainer.writer.put_scalars = lambda step, sc: (losses.append(sc.get("loss")), orig(step, sc))
    trainer.train(iters)
    return [l for l in losses if l is not None]


def test_nerfacto_camera_trains(tmp_path):
    cfg = _small(get_method("nerfacto"), tmp_path)
    losses = _losses(NerfactoTrainer(cfg))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_lidar_nerfacto_trains(tmp_path):
    cfg = _small(get_method("lidar-nerfacto"), tmp_path)
    assert cfg.model.predict_lidar
    losses = _losses(NerfactoTrainer(cfg))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_nerfacto_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint restores params + step exactly."""
    import jax
    import numpy as np

    cfg = _small(get_method("nerfacto"), tmp_path)
    cfg.steps_per_save = 0
    tr = NerfactoTrainer(cfg)
    tr.setup()
    tr.train(2)
    path = tr.save_checkpoint()
    assert path.exists()
    ref_leaf = np.asarray(jax.tree.leaves(tr.variables["params"])[0]).copy()
    old_step = tr._step

    tr2 = NerfactoTrainer(cfg)
    tr2.setup()
    tr2.load_checkpoint(path)
    assert tr2._step == old_step
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(tr2.variables["params"])[0]), ref_leaf)


def test_final_iteration_always_logged(tmp_path):
    """train(N) must log metrics for the LAST step even off the steps_per_log
    cadence (regression: the old condition compared against the moving
    self._step and only held for N == 1)."""
    cfg = _small(get_method("nerfacto"), tmp_path)
    cfg.steps_per_log = 100  # cadence never fires within 3 steps (past step 0)
    tr = NerfactoTrainer(cfg)
    tr.setup()
    logged = []
    orig = tr.writer.put_scalars
    tr.writer.put_scalars = lambda step, sc: (logged.append(step), orig(step, sc))
    last = tr.train(3)
    assert 2 in logged, logged  # final iteration (step 2) logged
    assert "loss" in last and np.isfinite(last["loss"])


def test_eval_psnr_on_heldout_split(tmp_path):
    """eval_psnr renders the eval split full-image (the number benchmarking.py
    reports — not the train-batch psnr)."""
    cfg = _small(get_method("nerfacto"), tmp_path)
    tr = NerfactoTrainer(cfg)
    tr.setup()
    tr.train(3)
    ev = tr.eval_psnr()
    assert "eval_psnr" in ev and np.isfinite(ev["eval_psnr"])
    # full-image render has the dataset resolution
    ci = int(tr.outputs.camera_split.eval[0])
    img = tr.render_camera(ci)
    assert img.shape == tuple(tr.outputs.image_size) + (3,)
    assert np.isfinite(img).all()
