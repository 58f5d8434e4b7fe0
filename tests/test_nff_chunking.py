"""Chunked NFF (nn.scan + remat) must match the unchunked forward exactly in
eval mode (no stochastic sampling)."""

import dataclasses

import jax
import numpy as np
import pytest

from neuradar_tpu.models.neuradar import NeuRadarModel
from tests.test_neuradar_model import RNGS, make_trajectories


@pytest.fixture(scope="module")
def setup(small_model_setup):
    # shared session-scoped init (tests/conftest.py)
    return small_model_setup


def test_chunked_matches_unchunked_eval(setup):
    model, variables, layout, bundle, batch, cfg, scene = setup
    out_ref, _ = model.apply(variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
                             rngs=RNGS, mutable=["batch_stats"])

    cfg2 = dataclasses.replace(cfg, nff_chunks=4)  # layout.total=72 not divisible by 4? ensure divisibility
    assert layout.total % 4 == 0, layout.total
    model2 = NeuRadarModel(config=cfg2, scene=scene, trajectories=make_trajectories())
    out_chunked, _ = model2.apply(variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
                                  rngs=RNGS, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_chunked["depth"]), np.asarray(out_ref["depth"]), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_chunked["accumulation"]), np.asarray(out_ref["accumulation"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out_chunked["rgb"]), np.asarray(out_ref["rgb"]), rtol=1e-3, atol=1e-4)


def test_chunked_train_gradients(setup):
    model, variables, layout, bundle, batch, cfg, scene = setup
    cfg2 = dataclasses.replace(cfg, nff_chunks=4, nff_remat=True)
    model2 = NeuRadarModel(config=cfg2, scene=scene, trajectories=make_trajectories())
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (total, _), _ = model2.apply(
            {"params": p, **other}, bundle, batch, layout, train=True,
            method=NeuRadarModel.loss_and_metrics, rngs=RNGS, mutable=["batch_stats"],
        )
        return total

    grads = jax.jit(jax.grad(loss_fn))(params)
    gsum = sum(float(abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_radar_decode_chunked_matches_unchunked(setup):
    """Scan-grouped radar decoding (radar_decode_chunks) is exact: attention
    is within-scan, so grouping only bounds the live [g, nr, nr] buffer."""
    model, variables, layout, bundle, batch, cfg, scene = setup

    cfg1 = dataclasses.replace(cfg, radar_decode_chunks=1)
    cfg2 = dataclasses.replace(cfg, radar_decode_chunks=layout.num_radar_scans)
    m1 = NeuRadarModel(config=cfg1, scene=scene, trajectories=make_trajectories())
    m2 = NeuRadarModel(config=cfg2, scene=scene, trajectories=make_trajectories())
    o1, _ = m1.apply(variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
                     rngs=RNGS, mutable=["batch_stats"])
    o2, _ = m2.apply(variables, bundle, layout, train=False, method=NeuRadarModel.get_outputs,
                     rngs=RNGS, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o2["radar_output"]), np.asarray(o1["radar_output"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2["radar_angles"]), np.asarray(o1["radar_angles"]),
                               rtol=1e-4, atol=1e-5)

    # gradients flow through the remat'd grouped decoder
    def loss2(params):
        total, _ = m2.apply({**variables, "params": params}, bundle, batch, layout, train=True,
                            method=NeuRadarModel.loss_and_metrics, rngs=RNGS, mutable=["batch_stats"])[0]
        return total

    import jax as _jax

    grads = _jax.jit(_jax.grad(loss2))(variables["params"])
    leaf = grads["radar_decoder"] if "radar_decoder" in grads else grads
    total_abs = sum(float(np.abs(np.asarray(x)).sum()) for x in _jax.tree.leaves(leaf))
    assert np.isfinite(total_abs) and total_abs > 0


@pytest.mark.parametrize("policy_name", ["save_grid", "save_corners"])
def test_save_grid_remat_policy_matches_all(setup, policy_name):
    """nff_remat_policy='save_grid' / 'save_corners' (save hashgrid gather
    outputs / additionally the gathered corner features — models/neuradar.py)
    are pure scheduling changes: loss and gradients must match the default
    full-recompute policy."""
    model, variables, layout, bundle, batch, cfg, scene = setup
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def make_loss(policy):
        cfg2 = dataclasses.replace(cfg, nff_chunks=4, nff_remat=True, nff_remat_policy=policy)
        m = NeuRadarModel(config=cfg2, scene=scene, trajectories=make_trajectories())

        def loss_fn(p):
            (total, _), _ = m.apply(
                {"params": p, **other}, bundle, batch, layout, train=True,
                method=NeuRadarModel.loss_and_metrics, rngs=RNGS, mutable=["batch_stats"],
            )
            return total

        return loss_fn

    l_all, g_all = jax.jit(jax.value_and_grad(make_loss("all")))(params)
    l_sg, g_sg = jax.jit(jax.value_and_grad(make_loss(policy_name)))(params)
    np.testing.assert_allclose(float(l_sg), float(l_all), rtol=1e-6)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(g_all), jax.tree_util.tree_leaves_with_path(g_sg)
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va), rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))


def test_packed_dense_cells_matches_unpacked_model(setup):
    """packed_dense_cells (encodings.pack_cells: per-cell corner rows +
    hoisted pack threaded through the chunk scan as an nn.broadcast
    constant) is a pure traffic-shaping change: full-model loss and
    gradients must match the plain combined-gather path."""
    import copy

    model, variables, layout, bundle, batch, cfg, scene = setup
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    cfg2 = copy.deepcopy(dataclasses.replace(cfg, nff_chunks=4))
    for grid in (cfg2.field.grid, cfg2.sampling.proposal_field_1.grid,
                 cfg2.sampling.proposal_field_2.grid):
        grid.static.packed_dense_cells = True
        grid.actor.packed_dense_cells = True
        grid.static.packed_max_cells = 2**17
        grid.actor.packed_max_cells = 2**17
    cfg1 = copy.deepcopy(dataclasses.replace(cfg, nff_chunks=4))

    def make_loss(c):
        m = NeuRadarModel(config=c, scene=scene, trajectories=make_trajectories())

        def loss_fn(p):
            (total, _), _ = m.apply(
                {"params": p, **other}, bundle, batch, layout, train=True,
                method=NeuRadarModel.loss_and_metrics, rngs=RNGS, mutable=["batch_stats"],
            )
            return total

        return loss_fn

    l0, g0 = jax.jit(jax.value_and_grad(make_loss(cfg1)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(make_loss(cfg2)))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(g0), jax.tree_util.tree_leaves_with_path(g1)
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va), rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))
