"""Frechet distance between image feature distributions (FID machinery).

cf. reference ad_pipeline.py:170-191, 283-291, 310-405: FID between real eval
images and renders from shifted poses (lane shift 0/2/3 m, vertical 1 m,
actor shifts). The reference uses torchmetrics' InceptionV3; no pretrained
Inception exists in this environment, so features come from the same flax
VGG-19 trunk used for the perceptual loss (random filters unless
$NEURADAR_VGG19_WEIGHTS is set) — distances are comparable within a run but
not against published Inception-FID numbers (documented deviation).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.model_components.vgg import Vgg19Features


class FeatureExtractor:
    """Pooled deep features for FID; params initialized once (fixed seed)."""

    def __init__(self, image_hw=(96, 156)):
        self.module = Vgg19Features()
        dummy = jnp.zeros((1, *image_hw, 3))
        self.params = self.module.init(jax.random.PRNGKey(0), dummy)
        self._fn = jax.jit(lambda imgs: self.module.apply(self.params, imgs)[-1].mean(axis=(1, 2)))

    def __call__(self, images: np.ndarray, batch: int = 8) -> np.ndarray:
        """images [N, H, W, 3] float in [0,1] -> [N, D] features."""
        if len(images) == 0:
            raise ValueError("FeatureExtractor needs at least one image (empty eval split?)")
        feats = []
        for i in range(0, len(images), batch):
            chunk = images[i : i + batch]
            if len(chunk) < batch:
                pad = batch - len(chunk)
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
                feats.append(np.asarray(self._fn(jnp.asarray(chunk)))[: batch - pad])
            else:
                feats.append(np.asarray(self._fn(jnp.asarray(chunk))))
        return np.concatenate(feats)


class PerceptualDistance:
    """LPIPS-style perceptual distance on the flax VGG trunk.

    cf. the reference's torchmetrics LPIPS (models/neuradar.py:321): unit-
    normalized feature differences averaged over layers/locations. Without
    pretrained AlexNet/VGG weights this is a *surrogate* (random filters
    unless $NEURADAR_VGG19_WEIGHTS is set) — consistent within a run, not
    comparable to published LPIPS values.
    """

    def __init__(self, image_hw=(96, 156)):
        self.module = Vgg19Features()
        dummy = jnp.zeros((1, *image_hw, 3))
        self.params = self.module.init(jax.random.PRNGKey(0), dummy)

        def dist(a, b):
            fa = self.module.apply(self.params, a[None])
            fb = self.module.apply(self.params, b[None])
            total = 0.0
            for x, y in zip(fa, fb):
                x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
                y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-8)
                total = total + jnp.mean(jnp.sum((x - y) ** 2, axis=-1))
            return total / len(fa)

        self._fn = jax.jit(dist)

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        return float(self._fn(jnp.asarray(pred), jnp.asarray(target)))


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians fit to feature sets."""
    from scipy import linalg

    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False) + eps * np.eye(feats_a.shape[1])
    cov_b = np.cov(feats_b, rowvar=False) + eps * np.eye(feats_b.shape[1])
    covmean, _ = linalg.sqrtm(cov_a @ cov_b, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(cov_a) + np.trace(cov_b) - 2 * np.trace(covmean))
