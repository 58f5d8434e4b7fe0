"""Diffusion-guidance hooks (cf. reference nerfstudio/generative/, ~600 LoC:
StableDiffusion / DeepFloyd score-distillation guidance, unused by the AD
training path).

The pretrained diffusion checkpoints those classes download are unavailable
in this environment (zero egress), so this module provides the same surface
gated behind an explicit weights path: construct ScoreDistillationGuidance
with a flax/torch checkpoint you supply, or importing the heavy classes
raises a clear error instead of failing deep inside a download.
"""

from __future__ import annotations

from typing import Optional


class ScoreDistillationGuidance:
    """Score-distillation (SDS) loss scaffold.

    cf. reference generative/stable_diffusion.py:sds_loss — given a noise
    predictor eps(x_t, t, text), the SDS gradient is w(t) * (eps_pred -
    eps) * dx/dtheta. The noise-predictor itself must be supplied; none ships
    in this image.
    """

    def __init__(self, noise_predictor=None, weights_path: Optional[str] = None):
        if noise_predictor is None:
            raise RuntimeError(
                "No diffusion model is bundled (zero-egress environment). Pass a "
                "`noise_predictor(x_t, t, conditioning) -> eps` callable backed by "
                "weights you provide (e.g. via $NEURADAR_DIFFUSION_WEIGHTS)."
            )
        self.noise_predictor = noise_predictor
        self.weights_path = weights_path

    def sds_grad(self, rng, images, conditioning, t_range=(0.02, 0.98)):
        """d(SDS)/d(images): perturb, denoise, return the guidance residual."""
        import jax
        import jax.numpy as jnp

        k_t, k_eps = jax.random.split(rng)
        t = jax.random.uniform(k_t, (images.shape[0],), minval=t_range[0], maxval=t_range[1])
        eps = jax.random.normal(k_eps, images.shape)
        alpha = jnp.cos(t * jnp.pi / 2)[:, None, None, None]
        sigma = jnp.sin(t * jnp.pi / 2)[:, None, None, None]
        x_t = alpha * images + sigma * eps
        eps_pred = self.noise_predictor(x_t, t, conditioning)
        w = (sigma**2)  # standard SDS weighting
        return w * (eps_pred - eps)
