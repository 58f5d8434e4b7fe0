"""Set-based (DETR-style) radar decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.model_components.radar_decoder import SetRadarDecoder


def test_set_decoder_shapes_and_ranges():
    dec = SetRadarDecoder(d_model=48, num_queries=32, num_decoder_layers=1, position_scale=50.0)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 48))
    geom = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3)) * 10
    variables = dec.init({"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}, feats, geom)
    out, angles = dec.apply(variables, feats, geom)
    assert out.shape == (2, 32, 7)
    assert angles.shape == (2, 32, 2)
    ep = np.asarray(out[..., 0])
    assert ((ep >= 0) & (ep <= 1)).all()
    assert (np.asarray(out[..., 4:]) >= 0).all()
    assert (np.abs(np.asarray(out[..., 1:4])) <= 50.0 + 1e-4).all()


def test_set_decoder_loss_compatible():
    from neuradar_tpu.model_components.radar_utils import calculate_radar_loss

    dec = SetRadarDecoder(d_model=48, num_queries=16, num_decoder_layers=1, position_scale=20.0)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48))
    geom = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 3)) * 5
    variables = dec.init({"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}, feats, geom)

    gt = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 3)) * 5
    mask = jnp.ones((2, 6), bool)

    def loss_fn(v):
        out, _ = dec.apply(v, feats, geom)
        loss, _ = calculate_radar_loss(gt, mask, out, loss_type="nll")
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    assert sum(float(abs(g).sum()) for g in jax.tree.leaves(grads)) > 0
