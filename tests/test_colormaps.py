"""Colormaps (utils/colormaps.py; cf. reference utils/colormaps.py routing)."""

import numpy as np
import pytest

from neuradar_tpu.utils.colormaps import (
    ColormapOptions,
    apply_colormap,
    apply_depth_colormap,
    apply_pca_colormap,
)


def test_rgb_passthrough():
    img = np.random.default_rng(0).uniform(size=(4, 5, 3))
    np.testing.assert_array_equal(apply_colormap(img), img)


def test_float_turbo_route():
    img = np.linspace(0, 1, 8, dtype=np.float32).reshape(8, 1)
    out = apply_colormap(img)  # default -> turbo
    assert out.shape == (8, 3)
    assert not np.allclose(out[0], out[-1])  # ends of the ramp differ
    gray = apply_colormap(img, ColormapOptions(colormap="gray"))
    np.testing.assert_allclose(gray, np.repeat(img, 3, -1))


def test_boolean_route():
    img = np.array([[True], [False]])
    out = apply_colormap(img)
    np.testing.assert_array_equal(out[0], [1, 1, 1])
    np.testing.assert_array_equal(out[1], [0, 0, 0])


def test_pca_route_reduces_features():
    feats = np.random.default_rng(1).normal(size=(6, 7, 16))
    out = apply_colormap(feats)
    assert out.shape == (6, 7, 3)
    assert (out >= 0).all() and (out <= 1).all()
    # constant features would degenerate; ensure variance survived
    assert out.std() > 0.01
    assert apply_pca_colormap(feats).shape == (6, 7, 3)


def test_depth_colormap_accumulation_fade():
    depth = np.linspace(1, 10, 4).reshape(4, 1)
    acc = np.array([[1.0], [1.0], [0.0], [0.0]])
    out = apply_depth_colormap(depth, accumulation=acc)
    assert out.shape == (4, 3)
    np.testing.assert_allclose(out[2], [1, 1, 1])  # zero accumulation -> white
    np.testing.assert_allclose(out[3], [1, 1, 1])


def test_non_listed_and_pca_scalar_colormaps():
    """LinearSegmentedColormaps (no .colors table) resample, and 'pca' on a
    scalar image falls back to turbo instead of crashing."""
    img = np.linspace(0, 1, 8, dtype=np.float32).reshape(8, 1)
    out = apply_colormap(img, ColormapOptions(colormap="jet"))
    assert out.shape == (8, 3) and not np.allclose(out[0], out[-1])
    pca = apply_colormap(img, ColormapOptions(colormap="pca"))
    np.testing.assert_allclose(pca, apply_colormap(img, ColormapOptions(colormap="turbo")))


def test_unroutable_raises():
    with pytest.raises(NotImplementedError):
        apply_colormap(np.zeros((4, 2), np.float32))
