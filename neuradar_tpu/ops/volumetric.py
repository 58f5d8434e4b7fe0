"""Pallas TPU kernel: fused volumetric compositing.

Computes, in ONE pass over the samples axis per ray block:
  weights_i = alpha_i * prod_{j<i}(1 - alpha_j)        (transmittance scan)
  features  = sum_i weights_i * f_i                    (feature render)
  depth     = sum_i weights_i * t_i                    (expected depth)
  accum     = sum_i weights_i

This fuses what the XLA path expresses as cumprod + three reductions
(cameras/rays.render_weights_from_alpha + model_components/renderers), which
on very large ray batches saves materializing the [rays, samples]
transmittance/weights intermediates in HBM. The XLA formulation remains the
default (it fuses well at NeuRAD scale); this kernel is the building block
for the fully fused field->render pipeline planned after profiling.

Block layout: rays are tiled in blocks of 128 (lane dimension = samples,
sublane = rays — both aligned to the (8, 128) tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 128


def _composite_kernel(alpha_ref, feats_ref, steps_ref, weights_ref, features_ref, depth_ref, accum_ref):
    alpha = alpha_ref[:]  # [B, S]
    # exclusive cumulative product of (1 - alpha) along samples
    one_minus = 1.0 - alpha + 1e-10
    trans_inc = jnp.cumprod(one_minus, axis=-1)
    trans_exc = jnp.concatenate([jnp.ones_like(trans_inc[:, :1]), trans_inc[:, :-1]], axis=-1)
    w = alpha * trans_exc  # [B, S]
    weights_ref[:] = w
    features_ref[:] = jnp.einsum("bs,bsc->bc", w, feats_ref[:], preferred_element_type=jnp.float32)
    depth_ref[:] = jnp.sum(w * steps_ref[:], axis=-1, keepdims=True)
    accum_ref[:] = jnp.sum(w, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_composite(alpha: jax.Array, features: jax.Array, steps: jax.Array, interpret: bool = False):
    """Fused compositing.

    Args:
        alpha: [R, S] per-sample alphas.
        features: [R, S, C] per-sample features.
        steps: [R, S] sample midpoints.
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        weights [R, S], rendered features [R, C], depth [R, 1], accum [R, 1].
    """
    R, S = alpha.shape
    C = features.shape[-1]
    n_blocks = pl.cdiv(R, RAY_BLOCK)
    grid = (n_blocks,)

    return pl.pallas_call(
        _composite_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S), alpha.dtype),
            jax.ShapeDtypeStruct((R, C), features.dtype),
            jax.ShapeDtypeStruct((R, 1), alpha.dtype),
            jax.ShapeDtypeStruct((R, 1), alpha.dtype),
        ],
        interpret=interpret,
    )(alpha, features, steps)
