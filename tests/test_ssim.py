"""Gaussian-window SSIM parity (reference models/neuradar.py:318,735 uses
torchmetrics' structural_similarity_index_measure: 11x11 gaussian window,
sigma=1.5, k1=0.01/k2=0.03, population moments, mean over valid windows).

Checked three ways: exact closed forms (identical and constant images) and an
independent per-window loop implementation of the same semantics.
"""

import numpy as np
import pytest

from neuradar_tpu.pipelines.ad_neuradar_pipeline import _gaussian_kernel1d, _ssim_np


def _ssim_loop(a, b, c1=0.01**2, c2=0.03**2, win=11, sigma=1.5):
    """Direct per-window implementation: gaussian-weighted population moments
    at every valid window center, averaged."""
    k1d = _gaussian_kernel1d(win, sigma)
    w = np.outer(k1d, k1d)
    h, wd, c = a.shape
    p = (win - 1) // 2
    vals = []
    for i in range(p, h - p):
        for j in range(p, wd - p):
            for ch in range(c):
                wa = a[i - p : i + p + 1, j - p : j + p + 1, ch]
                wb = b[i - p : i + p + 1, j - p : j + p + 1, ch]
                mu_a = (w * wa).sum()
                mu_b = (w * wb).sum()
                var_a = (w * wa * wa).sum() - mu_a**2
                var_b = (w * wb * wb).sum() - mu_b**2
                cov = (w * wa * wb).sum() - mu_a * mu_b
                vals.append(
                    ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                    / ((mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2))
                )
    return float(np.mean(vals))


def test_kernel_normalized_symmetric():
    k = _gaussian_kernel1d(11, 1.5)
    assert k.shape == (11,)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-12)
    np.testing.assert_allclose(k, k[::-1])
    assert k[5] == k.max()


def test_identical_images_give_one():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(24, 36, 3))
    assert _ssim_np(a, a.copy()) == pytest.approx(1.0, abs=1e-9)


def test_constant_images_closed_form():
    # constant a=x, b=y: mu=x/y, var=cov=0 -> ssim = (2xy+c1)/(x^2+y^2+c1)
    x, y, c1 = 0.3, 0.7, 0.01**2
    a = np.full((20, 20, 1), x)
    b = np.full((20, 20, 1), y)
    expected = (2 * x * y + c1) / (x**2 + y**2 + c1)
    assert _ssim_np(a, b) == pytest.approx(expected, abs=1e-9)


def test_matches_independent_loop_implementation():
    rng = np.random.default_rng(7)
    a = rng.uniform(size=(16, 18, 2))
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
    assert _ssim_np(a, b) == pytest.approx(_ssim_loop(a, b), abs=1e-10)


def test_tiny_image_shrinks_window_instead_of_crashing():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(7, 9, 3))  # smaller than the 11x11 window
    b = np.clip(a + 0.05, 0, 1)
    v = _ssim_np(a, b)
    assert np.isfinite(v) and -1.0 <= v <= 1.0
    # a 7x9 image gets a 7-tap window; parity with the loop impl at that size
    assert v == pytest.approx(_ssim_loop(a, b, win=7), abs=1e-10)
