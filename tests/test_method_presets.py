"""Method-preset registry parity (cf. reference method_configs.py:416-485)."""

import pytest

from neuradar_tpu.configs.method_configs import get_method, method_configs


def test_every_registered_method_builds():
    for name in method_configs:
        cfg = get_method(name)
        assert cfg.method_name == name, name


def test_reference_method_names_all_resolve():
    """Every public method name the reference registers (its
    method_configs.py) resolves here too — a reference user can reuse their
    exact train command."""
    reference_names = [
        "nerfacto", "nerfacto-big", "nerfacto-huge", "nerfacto-lidar",
        "neurad", "neurad-paper", "neurad-2x-paper", "neurad-scaleopt",
        "neuradar", "neurader", "neurader-scaleopt",
        "neuradest", "neuradest-scaleopt", "splatfacto", "splatfacto-big",
    ]
    for name in reference_names:
        cfg = get_method(name)
        assert cfg.method_name == name


def test_neurader_scaling_semantics():
    """2.5x schedule, halved lrs, doubled static grids, +1 hashmap bit
    (reference 'bigger better longer stronger', method_configs.py:446-456)."""
    base = get_method("neurad")
    er = get_method("neurader")
    assert er.max_num_iterations == int((base.max_num_iterations - 1) * 2.5 + 1)
    for k, g in er.optimizers.items():
        assert g.optimizer.lr == pytest.approx(base.optimizers[k].optimizer.lr * 0.5)
    bm, em = base.pipeline.model, er.pipeline.model
    assert em.field.grid.static.max_res == bm.field.grid.static.max_res * 2
    assert em.field.grid.static.base_res == bm.field.grid.static.base_res * 2
    assert em.field.grid.static.log2_hashmap_size == bm.field.grid.static.log2_hashmap_size + 1
    assert em.field.grid.actor.log2_hashmap_size == bm.field.grid.actor.log2_hashmap_size + 1


def test_neuradest_is_neurader_times_three():
    base = get_method("neurad")
    er = get_method("neurader")
    est = get_method("neuradest")
    assert est.max_num_iterations == int((er.max_num_iterations - 1) * 3 + 1)
    # inherits neurader's grid scaling AND halved learning rates (the
    # schedule stretch must not rebuild the optimizer groups)
    assert est.pipeline.model.field.grid.static.max_res == er.pipeline.model.field.grid.static.max_res
    for k, g in est.optimizers.items():
        assert g.optimizer.lr == pytest.approx(base.optimizers[k].optimizer.lr * 0.5), k
        if g.scheduler is not None:
            assert g.scheduler.max_steps == int(er.optimizers[k].scheduler.max_steps * 3)


def test_scaleopt_variants_use_scaled_camera_optimizer():
    from neuradar_tpu.cameras.camera_optimizers import ScaledCameraOptimizerConfig

    for name in ("neurad-scaleopt", "neurader-scaleopt", "neuradest-scaleopt"):
        cfg = get_method(name)
        opt = cfg.pipeline.model.camera_optimizer
        assert isinstance(opt, ScaledCameraOptimizerConfig), name
        assert opt.weights == (1.0, 1.0, 0.01, 0.01, 0.01, 1.0)


def test_paper_presets_disable_temporal_appearance_and_flip():
    for name in ("neurad-paper", "neurad-2x-paper"):
        cfg = get_method(name)
        m = cfg.pipeline.model
        assert m.use_temporal_appearance is False, name
        for f in (m.field, m.sampling.proposal_field_1, m.sampling.proposal_field_2):
            assert f.grid.actor.flip_prob == 0.0, name
    # the 2x variant also carries the neurader grid scaling
    assert (get_method("neurad-2x-paper").pipeline.model.field.grid.static.max_res
            == get_method("neurader").pipeline.model.field.grid.static.max_res)


def test_nerfacto_big_and_huge():
    big = get_method("nerfacto-big")
    huge = get_method("nerfacto-huge")
    assert big.max_num_iterations == huge.max_num_iterations == 100000
    assert big.model.hidden_dim == 128 and huge.model.hidden_dim == 256
    assert big.model.log2_hashmap_size == huge.model.log2_hashmap_size == 21
    assert huge.model.max_res == 8192
