"""Pallas TPU kernel: fused self-attention for the radar decoder.

The radar transformer attends over all ~3.4k rays of a scan
(cf. reference nerfstudio/detr/models/transformer.py:32-67 — the XLA path is
`flax.linen.MultiHeadDotProductAttention` in model_components/radar_decoder).
At the production shape ([16 scans, 3424 rays, d=48]) the attention matrix is
16 x 3424^2 ~ 375 MB bf16 per materialization; XLA writes it to HBM twice
(scores, probs), which makes attention bandwidth-bound and forces the model
to remat the decoder in groups (models/neuradar.py radar_decode_chunks).

This kernel never materializes scores in HBM: the grid runs over
(batch*heads, query blocks); one kernel invocation holds a [BQ, S] score
block, the full [S, D] K/V for that scan, softmax, optional attention-weight
dropout (stateless per-cell hash mask — no PRNG state), and the [BQ, D]
output — all in VMEM (~4-8 MB). The custom VJP recomputes probabilities in the backward
kernel (flash-attention style) instead of saving them, and accumulates
dK/dV across query blocks via output revisiting.

Toolchain notes (same Mosaic relay as ops/volumetric.py): only 2-D
non-batched dot_generals are used (3-D batched dots fail attribute parsing),
and reductions/softmax run on the VPU.

Sequence lengths that are not lane-multiples are handled by padding S to a
128 multiple OUTSIDE the kernel and masking padded keys to -inf inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 256
_NEG = -1e30
# Soft budget for the TOTAL estimated VMEM of ONE kernel invocation (score
# intermediates + the fixed K/V / accumulator blocks). The hardware
# scoped-vmem limit is 16 MB and is SHARED with async copies the scheduler
# overlaps with the kernel: a full-scale train step co-schedules enough
# prefetch traffic that a backward block set measured at 17.4 MB compiled
# standalone but OOM'd in-program (2026-08-18); and at the parity-corrected
# 3531-ray scan (s_pad 3584) a score-only budget left the backward 476 KB
# over the limit (2026-08-20 compile fault) — hence the fixed-overhead term.
_VMEM_SOFT_BUDGET = 12 * 1024 * 1024


def _fixed_vmem_bytes(s_pad: int, d: int, kv_itemsize: int, n_f32_accum: int) -> int:
    """Estimated VMEM held regardless of the query block size.

    The last dim pads to 128 lanes (d=48 physically occupies 128), K/V input
    blocks are double-buffered by the pipeline, and the dK/dV f32
    accumulators are revisited (single-buffered) [s_pad, d] blocks."""
    d_pad = -(-d // 128) * 128
    kv_in = 2 * 2 * s_pad * d_pad * kv_itemsize  # K + V, double-buffered
    accum = n_f32_accum * s_pad * d_pad * 4
    return kv_in + accum


def _pick_bq(s_pad: int, n_score_bufs: int, fixed_bytes: int = 0) -> int:
    """Largest power-of-two query block whose n_score_bufs [bq, s_pad] f32
    intermediates PLUS the fixed per-invocation blocks stay under the soft
    budget (floor 64 = 8 f32 sublane tiles)."""
    bq = min(Q_BLOCK, s_pad)
    while bq > 64 and fixed_bytes + n_score_bufs * bq * s_pad * 4 > _VMEM_SOFT_BUDGET:
        bq //= 2
    return bq


def _dot(a, b):  # [M, K] @ [K, N] on the MXU, f32 accumulate
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):  # [M, K] @ [N, K]^T -> [M, N], 2-D dot_general (no batch dims)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _key_mask(s_valid: int, s_pad: int, dtype):
    """[1, s_pad] additive mask: 0 for real keys, -inf for padding."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    return jnp.where(col < s_valid, 0.0, _NEG).astype(dtype)


def _probs(q, k, scale, s_valid):
    """Masked softmax probabilities [BQ, S_pad] in f32."""
    s = _dot_t(q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    s = s + _key_mask(s_valid, s.shape[-1], s.dtype)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _keep_mask(shape, rate, seed):
    """Stateless dropout keep mask (f32 0/1 scaled by 1/keep).

    A murmur3-finalizer hash of (seed, row, col) rather than the stateful
    pltpu PRNG: bit-identical between the forward and backward kernels by
    construction, and it lowers on every backend (interpret mode has no
    prng_seed rule). `seed` is a traced uint32 unique per grid cell."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(0x9E3779B9) + c * jnp.uint32(0x85EBCA6B) + seed * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    keep = (x >= thresh).astype(jnp.float32)
    return keep / (1.0 - rate)


def _cell_seed(seed_ref):
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    return (seed_ref[0] + cell).astype(jnp.uint32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, s_valid, rate):
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S, D]
    v = v_ref[0]  # [S, D]
    p = _probs(q, k, scale, s_valid)
    if rate > 0.0:
        p = p * _keep_mask(p.shape, rate, _cell_seed(seed_ref))
    o_ref[0] = _dot(p, v.astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, s_valid, rate):
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)  # [BQ, D]
    p = _probs(q, k, scale, s_valid)  # [BQ, S] softmax probs (pre-dropout)
    if rate > 0.0:
        # same stateless hash as forward -> identical keep mask
        m = _keep_mask(p.shape, rate, _cell_seed(seed_ref))
        p_drop = p * m
    else:
        m = None
        p_drop = p

    dp_drop = _dot_t(do, v.astype(jnp.float32))  # [BQ, S] = do @ v^T (contract D)
    # chain: out = (m . p) @ v with p = softmax(s). Gradient wrt the softmax
    # probs is g = m . dp_drop; softmax VJP: ds = p . (g - sum_j g_j p_j)
    g = dp_drop * m if m is not None else dp_drop
    ds = p * (g - jnp.sum(g * p, axis=-1, keepdims=True))
    ds = ds * scale

    dq_ref[0] = _dot(ds, k.astype(jnp.float32)).astype(dq_ref.dtype)
    dk_c = _dot(jnp.swapaxes(ds, 0, 1), q.astype(jnp.float32))  # [S, D]
    dv_c = _dot(jnp.swapaxes(p_drop, 0, 1), do)  # [S, D]

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_c.astype(dk_ref.dtype)
    dv_ref[0] += dv_c.astype(dv_ref.dtype)


def _pad(x, s_pad):
    s = x.shape[1]
    return x if s == s_pad else jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))


def _specs(bq, s_pad, d):
    kvblk = pl.BlockSpec((1, s_pad, d), (lambda b, i: (b, 0, 0)), memory_space=pltpu.VMEM)
    qblk = pl.BlockSpec((1, bq, d), (lambda b, i: (b, i, 0)), memory_space=pltpu.VMEM)
    return qblk, kvblk


def _fwd_call(q, k, v, seed, scale, rate, interpret):
    B, S, D = q.shape
    s_pad = -(-S // 128) * 128
    bq = _pick_bq(s_pad, 2 + (1 if rate > 0.0 else 0),
                  _fixed_vmem_bytes(s_pad, D, q.dtype.itemsize, n_f32_accum=0))
    nq = pl.cdiv(S, bq)
    qp = _pad(q, nq * bq)
    kp, vp = _pad(k, s_pad), _pad(v, s_pad)
    qblk, kvblk = _specs(bq, s_pad, D)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, s_valid=S, rate=rate),
        grid=(B, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qblk, kvblk, kvblk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((B, nq * bq, D), q.dtype),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp)
    return out[:, :S]


def _bwd_call(q, k, v, do, seed, scale, rate, interpret):
    B, S, D = q.shape
    s_pad = -(-S // 128) * 128
    # the backward holds ~4 score-shaped f32 buffers live (p, dp, g-sum
    # chain, ds) + the dropout mask when training, plus the f32 dK/dV
    # accumulator blocks
    bq = _pick_bq(s_pad, 4 + (1 if rate > 0.0 else 0),
                  _fixed_vmem_bytes(s_pad, D, q.dtype.itemsize, n_f32_accum=2))
    nq = pl.cdiv(S, bq)
    qp, dop = _pad(q, nq * bq), _pad(do, nq * bq)
    kp, vp = _pad(k, s_pad), _pad(v, s_pad)
    qblk, kvblk = _specs(bq, s_pad, D)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, s_valid=S, rate=rate),
        grid=(B, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qblk, kvblk, kvblk, qblk],
        out_specs=[qblk, kvblk, kvblk],
        out_shape=[
            jax.ShapeDtypeStruct((B, nq * bq, D), q.dtype),
            # dK/dV accumulate across query blocks: keep the running sums in
            # f32 even for bf16 inputs (14 read-modify-write rounds at the
            # production shape would round partial sums to 8 mantissa bits)
            jax.ShapeDtypeStruct((B, s_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, s_pad, D), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp, dop)
    return dq[:, :S], dk[:, :S].astype(k.dtype), dv[:, :S].astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_self_attention(q, k, v, seed=0, dropout_rate: float = 0.0,
                         scale: float | None = None, interpret: bool = False):
    """Fused softmax(q k^T / sqrt(D)) v without materializing scores in HBM.

    Args:
        q, k, v: [B, S, D] (fold heads into B; the radar decoder is 1-head).
        seed: int32 scalar (python int or TRACED array — vary it per training
            step) seeding the stateless dropout hash; forward and backward
            regenerate the identical mask from it.
        dropout_rate: applied to the softmax probabilities like
            flax MultiHeadDotProductAttention (inverted scaling by 1/keep).
        scale: score scale; default 1/sqrt(D) (flax parity).

    Returns [B, S, D] in q.dtype; f32 accumulation internally.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fwd_call(q, k, v, seed, scale, dropout_rate, interpret)


def _fsa_fwd(q, k, v, seed, dropout_rate, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out = _fwd_call(q, k, v, seed, scale, dropout_rate, interpret)
    return out, (q, k, v, seed)


def _fsa_bwd(dropout_rate, scale, interpret, res, do):
    q, k, v, seed = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dq, dk, dv = _bwd_call(q, k, v, do, seed, scale, dropout_rate, interpret)
    # integer seed has a float0 cotangent
    import numpy as np

    seed_ct = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return dq, dk, dv, seed_ct


fused_self_attention.defvjp(_fsa_fwd, _fsa_bwd)


def reference_attention(q, k, v, scale: float | None = None):
    """XLA reference (what flax MHA computes, deterministic): for parity
    tests and as the non-TPU fallback."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)
