"""Hoisted once-per-step hash-table cast (models/neuradar.py
hoist_table_cast) must match the in-scan cast: identical forward loss, close
gradients (table cotangents accumulate across nff chunks in bf16 instead of
f32), and strictly fewer f32->bf16 table converts in the optimized HLO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuradar_tpu.field_components.encodings import cast_hash_tables
from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipeline
from tests.test_trainer_e2e import tiny_outputs, tiny_trainer_config


def tiny_pipeline(hoist: bool) -> ADNeuRadarPipeline:
    cfg = tiny_trainer_config().pipeline
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.nff_chunks = 4
    cfg.model.hoist_table_cast = hoist
    return ADNeuRadarPipeline(cfg, tiny_outputs())


def test_cast_hash_tables_only_touches_tables():
    params = {
        "field": {"hashgrid": {"static_grid": {"hash_table": jnp.ones(64, jnp.float32)}}},
        "mlp": {"kernel": jnp.ones((4, 4), jnp.float32)},
    }
    out = cast_hash_tables(params, jnp.bfloat16)
    assert out["field"]["hashgrid"]["static_grid"]["hash_table"].dtype == jnp.bfloat16
    assert out["mlp"]["kernel"].dtype == jnp.float32


def _subjaxprs(eqn):
    for v in eqn.params.values():
        vs = v if isinstance(v, (tuple, list)) else (v,)
        for u in vs:
            if hasattr(u, "jaxpr"):  # ClosedJaxpr
                yield u.jaxpr
            elif hasattr(u, "eqns"):  # Jaxpr
                yield u


def _count_table_converts(jaxpr, elems, inside_scan=False):
    """f32->bf16 converts of a table-sized rank-1 array that sit INSIDE a
    scan body (executed once per chunk)."""
    n = 0
    for eqn in jaxpr.eqns:
        if inside_scan and eqn.primitive.name == "convert_element_type":
            out, inp = eqn.outvars[0].aval, eqn.invars[0].aval
            if (out.shape == (elems,) and out.dtype == jnp.bfloat16
                    and inp.dtype == jnp.float32):
                n += 1
        enter_scan = inside_scan or eqn.primitive.name == "scan"
        for sub in _subjaxprs(eqn):
            n += _count_table_converts(sub, elems, enter_scan)
    return n


@pytest.fixture(scope="module")
def loss_and_grads():
    """(loss, grads, n_in_scan_table_converts) for hoist off/on."""
    results = {}
    for hoist in (False, True):
        pipe = tiny_pipeline(hoist)
        variables = pipe.init_variables(0)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        loss_fn = pipe.make_train_loss_fn()
        batch = jax.tree.map(jnp.asarray, pipe.datamanager.sample_train_batch())

        def step(p):
            total, _aux = loss_fn(p, batch_stats, batch, jax.random.PRNGKey(7))
            return total

        loss, grads = jax.jit(jax.value_and_grad(step))(params)
        s = pipe.config.model.field.grid.static
        elems = (2 ** s.log2_hashmap_size) * s.num_levels * s.hashgrid_dim
        casts = _count_table_converts(jax.make_jaxpr(jax.value_and_grad(step))(params), elems)
        results[hoist] = (float(loss), grads, casts)
    return results


def test_forward_loss_identical(loss_and_grads):
    loss_off, _, _ = loss_and_grads[False]
    loss_on, _, _ = loss_and_grads[True]
    # the cast value is the same bf16 table either way; only its placement
    # (and the cotangent accumulation dtype) differs
    assert np.isfinite(loss_on)
    np.testing.assert_allclose(loss_on, loss_off, rtol=1e-5)


def test_gradients_close(loss_and_grads):
    _, g_off, _ = loss_and_grads[False]
    _, g_on, _ = loss_and_grads[True]
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    flat_on = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_on)}
    for key, v_off in flat_off:
        v_on = flat_on[jax.tree_util.keystr(key)]
        a, b = np.asarray(v_off, np.float32), np.asarray(v_on, np.float32)
        # bf16 cross-chunk accumulation: compare at bf16-resolution tolerance,
        # scaled by the leaf's overall magnitude (tables are sparse-touched)
        tol = 2e-2 * max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=tol, err_msg=jax.tree_util.keystr(key))


def test_hoist_removes_in_scan_table_casts(loss_and_grads):
    _, _, casts_off = loss_and_grads[False]
    _, _, casts_on = loss_and_grads[True]
    # unhoisted: the cast traces into the scan body (re-executed per chunk,
    # plus the remat recompute in backward); hoisted: none remain in any scan
    assert casts_off >= 1, casts_off
    assert casts_on == 0, casts_on
