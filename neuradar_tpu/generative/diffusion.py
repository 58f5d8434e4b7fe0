"""Diffusion guidance: trainable noise predictor, schedulers, DDIM sampling,
score-distillation loss, and position-dependent conditioning.

cf. reference nerfstudio/generative/ — stable_diffusion.py:42-305
(StableDiffusion.sds_loss/produce_latents around a downloaded UNet),
deepfloyd.py (same surface, pixel-space), positional_text_embeddings.py:28-121.
The pretrained checkpoints those wrap are unavailable here (zero egress), so
the guidance machinery is built around ANY `predict(params, x_t, t, cond) ->
eps` — including `TinyNoisePredictor`, a small flax UNet trainable in-env —
and external weights can be plugged through the same interface.
"""

from __future__ import annotations

import math
from typing import Callable, Literal, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Noise schedule (DDPM cosine, Nichol & Dhariwal). The reference relies on
# diffusers' PNDMScheduler.add_noise + its `alphas_cumprod` table
# (stable_diffusion.py:74-76); alpha_bar plays the same role here.
# ---------------------------------------------------------------------------


def alpha_bar(t: jax.Array) -> jax.Array:
    """Continuous cosine cumulative signal level; t in [0, 1]."""
    return jnp.cos((t + 0.008) / 1.008 * jnp.pi / 2) ** 2


def add_noise(x: jax.Array, eps: jax.Array, t: jax.Array) -> jax.Array:
    """q(x_t | x_0): sqrt(ab) x + sqrt(1-ab) eps, t broadcast per-sample."""
    ab = alpha_bar(t).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sqrt(ab) * x + jnp.sqrt(1.0 - ab) * eps


def _time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal timestep embedding, [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / max(1, half - 1))
    ang = t[:, None] * 1000.0 * freqs[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TinyNoisePredictor(nn.Module):
    """Small convolutional eps-predictor with FiLM time/conditioning.

    Standing in for the reference's downloaded UNet (stable_diffusion.py:66-72)
    at a size trainable on host: NHWC input, two conv stages modulated by
    (time embedding + optional conditioning vector), residual output head
    initialised near zero so training starts close to eps=0.
    """

    hidden: int = 32
    cond_dim: int = 0

    @nn.compact
    def __call__(self, x_t: jax.Array, t: jax.Array, cond: Optional[jax.Array] = None) -> jax.Array:
        emb = _time_embedding(t, self.hidden)
        if self.cond_dim and cond is not None:
            emb = emb + nn.Dense(self.hidden, name="cond_proj")(cond)
        emb = nn.silu(nn.Dense(self.hidden * 2, name="emb_mlp")(nn.silu(emb)))
        scale, shift = jnp.split(emb, 2, axis=-1)

        h = nn.Conv(self.hidden, (3, 3), name="conv_in")(x_t)
        h = nn.silu(h * (1 + scale[:, None, None, :]) + shift[:, None, None, :])
        h = nn.silu(nn.Conv(self.hidden, (3, 3), name="conv_mid")(h))
        out = nn.Conv(x_t.shape[-1], (3, 3), name="conv_out",
                      kernel_init=nn.initializers.normal(1e-3))(h)
        return out


def denoising_loss(predict: Callable, params, rng, x0: jax.Array, cond=None) -> jax.Array:
    """Standard DDPM training objective E||eps - eps_hat||^2 — train your own
    guidance model in-env (what the reference cannot do without downloads)."""
    k_t, k_eps = jax.random.split(rng)
    t = jax.random.uniform(k_t, (x0.shape[0],), minval=0.02, maxval=0.98)
    eps = jax.random.normal(k_eps, x0.shape)
    x_t = add_noise(x0, eps, t)
    return jnp.mean((predict(params, x_t, t, cond) - eps) ** 2)


def ddim_sample(
    predict: Callable,
    params,
    rng: jax.Array,
    shape: tuple,
    num_steps: int = 50,
    cond=None,
) -> jax.Array:
    """Deterministic DDIM sampler x_T -> x_0 (the reference's produce_latents
    loop, stable_diffusion.py:172-220, with eta=0), lax.scan over a static
    timestep ladder so the whole chain jits as one program."""
    x = jax.random.normal(rng, shape)
    ts = jnp.linspace(0.98, 0.02, num_steps)

    def body(x, tt):
        t_now, t_next = tt
        b = jnp.full((shape[0],), t_now)
        eps = predict(params, x, b, cond)
        ab_now = alpha_bar(t_now)
        ab_next = alpha_bar(t_next)
        x0_hat = (x - jnp.sqrt(1 - ab_now) * eps) / jnp.sqrt(ab_now)
        x = jnp.sqrt(ab_next) * x0_hat + jnp.sqrt(1 - ab_next) * eps
        return x, None

    pairs = jnp.stack([ts, jnp.concatenate([ts[1:], jnp.zeros((1,))])], axis=-1)
    x, _ = jax.lax.scan(body, x, pairs)
    return x


class ScoreDistillationGuidance:
    """Score-distillation (SDS) loss, DreamFusion-style.

    Reference semantics (stable_diffusion.py:128-170): sample t, noise the
    image, predict eps with classifier-free guidance
    `eps_c + s * (eps_c - eps_u)` (the reference guides from the CONDITIONAL
    branch, stable_diffusion.py:159 — not the textbook eps_u base; kept for
    parity), weight by w(t)=1-alpha_bar, and return
    `0.5 * mse(x, stop_grad(x - grad)) / B` so d(loss)/dx == grad.

    Args:
        predict: (params, x_t, t, cond) -> eps. Supply TinyNoisePredictor.apply
            (trained in-env) or a wrapper around external weights
            ($NEURADAR_DIFFUSION_WEIGHTS); none ships in this image.
        params: parameters for `predict`.
        uncond: conditioning vector used for the unconditional branch
            (zeros_like(cond) when None).
    """

    def __init__(self, predict: Optional[Callable] = None, params=None, uncond=None):
        if predict is None:
            raise RuntimeError(
                "No diffusion model is bundled (zero-egress environment). Pass "
                "predict=(params, x_t, t, cond) -> eps — e.g. a TinyNoisePredictor "
                "trained with denoising_loss, or external weights via "
                "$NEURADAR_DIFFUSION_WEIGHTS."
            )
        self.predict = predict
        self.params = params
        self.uncond = uncond

    def sds_loss(self, rng, images, cond=None, guidance_scale: float = 100.0,
                 t_range=(0.02, 0.98)) -> jax.Array:
        k_t, k_eps = jax.random.split(rng)
        t = jax.random.uniform(k_t, (images.shape[0],), minval=t_range[0], maxval=t_range[1])
        eps = jax.random.normal(k_eps, images.shape)
        x_t = add_noise(images, eps, t)
        x_t = jax.lax.stop_gradient(x_t)  # reference: UNet runs under no_grad

        if cond is not None:
            eps_c = self.predict(self.params, x_t, t, cond)
            uncond = self.uncond if self.uncond is not None else jnp.zeros_like(cond)
            eps_u = self.predict(self.params, x_t, t, uncond)
            eps_pred = eps_c + guidance_scale * (eps_c - eps_u)
        else:
            eps_pred = self.predict(self.params, x_t, t, None)

        w = (1.0 - alpha_bar(t)).reshape((-1,) + (1,) * (images.ndim - 1))
        grad = jnp.nan_to_num(w * (eps_pred - eps))
        target = jax.lax.stop_gradient(images - grad)
        return 0.5 * jnp.sum((images - target) ** 2) / images.shape[0]


class PositionalEmbeddings:
    """Camera-position-dependent conditioning (DreamFusion positional
    prompting; reference positional_text_embeddings.py:28-121). Works on
    arbitrary embedding arrays — the reference builds them from CLIP text
    prompts; here any vectors (e.g. learned codes) plug in.

    Modes: 'discrete' picks top/front/side/back by angle thresholds,
    'interpolated' blends neighbouring views then blends with top by
    elevation, 'off' always returns base.
    """

    def __init__(self, base, top, side, back, front,
                 mode: Literal["discrete", "interpolated", "off"] = "discrete"):
        self.base, self.top, self.side, self.back, self.front = (
            jnp.asarray(v) for v in (base, top, side, back, front))
        self.mode = mode

    def __call__(self, vertical_angle: float, horizontal_angle: float) -> jax.Array:
        h = float(horizontal_angle) % 360.0
        v = float(vertical_angle)
        if self.mode == "off":
            return self.base
        if self.mode == "discrete":
            if v < 40:
                return self.top
            if h > 315 or h <= 45:
                return self.front
            if 45 < h <= 135 or h > 225 and h <= 315:
                return self.side
            return self.back
        # interpolated — same piecewise blend as the reference (:105-119),
        # except h == 0 lands in the first branch (pure front): the
        # reference's open interval sends 0 to the last branch, which
        # EXTRAPOLATES to 4*side - 3*front for a straight-ahead view
        v = max(v, 0.0)
        if 0 <= h <= 90:
            e = h * self.side + (90 - h) * self.front
        elif 90 < h <= 180:
            e = (h - 90) * self.back + (180 - h) * self.side
        elif 180 < h <= 270:
            e = (h - 180) * self.side + (270 - h) * self.back
        else:
            e = (h - 270) * self.front + (360 - h) * self.side
        e = e / 90.0
        return (v * e + (90 - v) * self.top) / 90.0
