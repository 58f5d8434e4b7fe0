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
_EPS = 1e-7  # matches cameras/rays.render_weights_from_alpha


def _cumsum_lanes(x):
    """Inclusive cumsum along the last axis as a triangular matmul — this
    Pallas TPU lowering implements neither cumprod nor cumsum (measured
    2026-08-17), but an [S, S] ones-mask matmul rides the MXU and S is tiny
    (~33 samples)."""
    S = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    mask = (row <= col).astype(x.dtype)  # M[j, i] = 1 when j <= i
    return jax.lax.dot(x, mask, precision=jax.lax.Precision.HIGHEST)


def _cumprod_lanes(x):
    """Inclusive cumprod along the last axis via exp(cumsum(log)); x must be
    > 0, which the +_EPS guard guarantees."""
    return jnp.exp(_cumsum_lanes(jnp.log(x)))


def _composite_sky_fwd_kernel(alpha_ref, feats_ref, wsky_ref, features_ref, accum_ref):
    """Forward: weights from alpha (exclusive cumprod of 1-alpha), remaining
    probability mass dumped on the LAST (sky) sample, feature render — the
    exact semantics of models/neuradar._nff_core's compositing block."""
    alpha = alpha_ref[:].astype(jnp.float32)  # [B, S]
    trans_inc = _cumprod_lanes(1.0 - alpha + _EPS)
    trans_exc = jnp.concatenate([jnp.ones_like(trans_inc[:, :1]), trans_inc[:, :-1]], axis=-1)
    w = alpha * trans_exc
    accum = jnp.sum(w, axis=-1, keepdims=True)
    w_sky = jnp.concatenate([w[:, :-1], w[:, -1:] + 1.0 - accum], axis=-1)
    wsky_ref[:] = w_sky.astype(wsky_ref.dtype)
    # broadcast-multiply + reduce instead of a batched dot: this Mosaic
    # version fails to parse 3-D dot_dimension_numbers (measured 2026-08-17)
    features_ref[:] = jnp.sum(
        w_sky[..., None] * feats_ref[:].astype(jnp.float32), axis=1
    ).astype(features_ref.dtype)
    accum_ref[:] = accum.astype(accum_ref.dtype)


def _composite_sky_bwd_kernel(alpha_ref, feats_ref, dwsky_ref, df_ref, daccum_ref, dalpha_ref, dfeats_ref):
    """Backward: recompute transmittance in VMEM (cheaper than saving the
    [R, S] weights to HBM) and apply the cumprod/sky-redistribution VJP."""
    alpha = alpha_ref[:].astype(jnp.float32)  # [B, S]
    feats = feats_ref[:].astype(jnp.float32)  # [B, S, C]
    dwsky = dwsky_ref[:].astype(jnp.float32)  # [B, S]
    df = df_ref[:].astype(jnp.float32)  # [B, C]
    daccum = daccum_ref[:].astype(jnp.float32)  # [B, 1]

    one_minus = 1.0 - alpha + _EPS
    trans_inc = _cumprod_lanes(one_minus)
    trans_exc = jnp.concatenate([jnp.ones_like(trans_inc[:, :1]), trans_inc[:, :-1]], axis=-1)
    w = alpha * trans_exc
    accum = jnp.sum(w, axis=-1, keepdims=True)
    w_sky = jnp.concatenate([w[:, :-1], w[:, -1:] + 1.0 - accum], axis=-1)

    # features = sum_s w_sky[s] f[s]
    dfeats_ref[:] = (w_sky[..., None] * df[:, None, :]).astype(dfeats_ref.dtype)
    dwsky_total = dwsky + jnp.sum(feats * df[:, None, :], axis=-1)

    # w_sky[j<last] = w[j]; w_sky[last] = 1 - sum_{j<last} w[j]; accum = sum w
    dlast = dwsky_total[:, -1:]
    dw = jnp.concatenate([dwsky_total[:, :-1] - dlast, jnp.zeros_like(dlast)], axis=-1) + daccum

    # cumprod VJP: dalpha[i] = dw[i] T[i] - (sum_{k>i} dw[k] w[k]) / (1 - alpha[i] + eps)
    g = dw * w
    suffix = jnp.sum(g, axis=-1, keepdims=True) - _cumsum_lanes(g)
    dalpha_ref[:] = (dw * trans_exc - suffix / one_minus).astype(dalpha_ref.dtype)


def _sky_pallas_fwd(alpha, feats, interpret):
    R, S = alpha.shape
    C = feats.shape[-1]
    grid = (pl.cdiv(R, RAY_BLOCK),)
    return pl.pallas_call(
        _composite_sky_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S), alpha.dtype),
            jax.ShapeDtypeStruct((R, C), feats.dtype),
            jax.ShapeDtypeStruct((R, 1), alpha.dtype),
        ],
        interpret=interpret,
    )(alpha, feats)


def _sky_pallas_bwd(alpha, feats, dwsky, df, daccum, interpret):
    R, S = alpha.shape
    C = feats.shape[-1]
    grid = (pl.cdiv(R, RAY_BLOCK),)
    return pl.pallas_call(
        _composite_sky_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, S), alpha.dtype),
            jax.ShapeDtypeStruct((R, S, C), feats.dtype),
        ],
        interpret=interpret,
    )(alpha, feats, dwsky, df, daccum)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_composite_sky(alpha: jax.Array, feats: jax.Array, interpret: bool = False):
    """Training-capable fused compositing with sky redistribution.

    alpha [R, S], feats [R, S, C] ->
      w_sky [R, S]  (weights, remainder dumped on the last/sky sample),
      features [R, C] (= sum_s w_sky f),
      accum [R, 1]  (= sum_s w, pre-redistribution).

    One VMEM pass instead of cumprod + concat + broadcast-multiply + reduce;
    the custom VJP recomputes transmittance in the backward kernel rather
    than saving [R, S] intermediates to HBM. Semantics match
    models/neuradar._nff_core (weights_sky block) exactly.
    """
    return _sky_pallas_fwd(alpha, feats, interpret)


def _fcs_fwd(alpha, feats, interpret):
    # NOTE: custom_vjp passes nondiff_argnums in their ORIGINAL positions to
    # fwd, but as LEADING args to bwd
    out = _sky_pallas_fwd(alpha, feats, interpret)
    return out, (alpha, feats)


def _fcs_bwd(interpret, res, grads):
    alpha, feats = res
    dwsky, df, daccum = grads
    dalpha, dfeats = _sky_pallas_bwd(alpha, feats, dwsky, df, daccum, interpret)
    return dalpha, dfeats


fused_composite_sky.defvjp(_fcs_fwd, _fcs_bwd)


def _composite_kernel(alpha_ref, feats_ref, steps_ref, weights_ref, features_ref, depth_ref, accum_ref):
    alpha = alpha_ref[:]  # [B, S]
    # exclusive cumulative product of (1 - alpha) along samples
    one_minus = 1.0 - alpha + _EPS
    trans_inc = _cumprod_lanes(one_minus)
    trans_exc = jnp.concatenate([jnp.ones_like(trans_inc[:, :1]), trans_inc[:, :-1]], axis=-1)
    w = alpha * trans_exc  # [B, S]
    weights_ref[:] = w
    features_ref[:] = jnp.sum(w[..., None] * feats_ref[:], axis=1)
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
