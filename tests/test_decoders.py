"""Decoder component tests: sine position embedding (reference formula
parity), RGB decoder shapes, radar transformer."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.model_components.cnns import RGBDecoder
from neuradar_tpu.model_components.radar_decoder import (
    RadarDecoder,
    sine_position_embedding,
    spherical_to_cartesian,
)


def _reference_sine_embedding(xyz, num_channels, temperature=10000.0):
    """Re-derivation of PositionEmbeddingCoordsSine.get_sine_embeddings
    (position_encoding_3d.py:56-99) in numpy for value parity."""
    N, nr, d_in = xyz.shape
    ndim = num_channels // d_in
    if ndim % 2 != 0:
        ndim -= 1
    rems = num_channels - ndim * d_in
    outs = []
    for d in range(d_in):
        cdim = ndim
        if rems > 0:
            cdim += 2
            rems -= 2
        dim_t = temperature ** (2 * (np.arange(cdim) // 2) / cdim)
        pos = xyz[..., d] * 2 * np.pi
        pos = pos[..., None] / dim_t
        inter = np.stack([np.sin(pos[..., 0::2]), np.cos(pos[..., 1::2])], axis=-1).reshape(N, nr, -1)
        outs.append(inter)
    return np.concatenate(outs, axis=-1)


def test_sine_embedding_matches_reference_formula():
    xyz = np.random.RandomState(0).randn(2, 5, 3).astype(np.float32) * 10
    got = np.asarray(sine_position_embedding(jnp.asarray(xyz), 48))
    expect = _reference_sine_embedding(xyz, 48)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
    assert got.shape == (2, 5, 48)


def test_spherical_to_cartesian():
    depth = jnp.asarray([[[10.0]]])
    out = spherical_to_cartesian(depth, jnp.asarray([[[0.0]]]), jnp.asarray([[[0.0]]]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], [10, 0, 0], atol=1e-5)
    out = spherical_to_cartesian(depth, jnp.asarray([[[np.pi / 2]]]), jnp.asarray([[[0.0]]]))
    np.testing.assert_allclose(np.asarray(out)[0, 0], [0, 0, 10], atol=1e-4)


def test_rgb_decoder_upsamples():
    dec = RGBDecoder(hidden_dim=8, upsample_factor=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 48))
    variables = dec.init(jax.random.PRNGKey(1), x)
    out = dec.apply(variables, x)
    assert out.shape == (2, 24, 24, 3)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


def test_radar_decoder_offsets_bounded():
    dec = RadarDecoder(d_model=48, offset_scale=1.5)
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 48))
    geom = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3)) * 20
    variables = dec.init({"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}, feats, geom)
    out, _ = dec.apply(variables, feats, geom)
    # xyz = geometry + 1.5 * tanh(...): offsets bounded by 1.5 m (cf.
    # models/neuradar.py:487-488)
    offsets = np.asarray(out[..., 1:4]) - np.asarray(geom)
    assert (np.abs(offsets) <= 1.5 + 1e-5).all()
