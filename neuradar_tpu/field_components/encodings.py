"""Input encodings: multiresolution hash grids and spherical harmonics.

TPU-native replacement for tiny-cuda-nn (reference
nerfstudio/field_components/encodings.py:311-471 is the behavioral spec via
its pure-torch fallback). The hash function is bit-compatible with that spec:
products are taken in uint32 (wraparound), and because the table size is a
power of two dividing 2^32, the low log2(T) bits — the only ones surviving the
modulo — are identical to the reference's int64 arithmetic.

TPU memory layout rules drive the implementation (buffers are tiled (8, 128)
on their last two dims, so any [big, tiny] array is padded up to lane width —
a [33.5M, 4] table would physically occupy 16 GB):

  * the table parameter is stored FLAT 1-D [levels * table_size * features],
  * all (corner, level, feature) lookups are ONE combined gather with a wide
    [N, 2^d * L * F] index/output (>= 48 lanes, so padding stays small),
  * a custom VJP stores the flat positions and the gathered corner features
    (named ``hashgrid_corners``): the backward recomputes indices/weights
    (cheap VPU math), scatter-adds the table gradient, and reads the corner
    features for the position gradient from the residual. Under the
    ``nff_chunks`` remat scan the save-vs-recompute choice belongs to the
    checkpoint POLICY: ``save_grid`` recomputes the residual (ONE wide
    regather — the recompute-over-store tradeoff tcnn makes in CUDA), while
    ``save_corners`` stores it, removing the backward's random-access table
    pass entirely at the cost of a sequential [N, 2^d*L*F] store+load. The
    random gathers read 8-byte rows (F=4 bf16) against >=32-byte HBM
    transactions, so their physical traffic is ~4x the counted bytes —
    sequential residual traffic is not (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

# Same primes as Instant-NGP / tcnn; reference encodings.py:418 uses the first
# three, tcnn uses the fourth for 4D inputs (actor-index grids).
_HASH_PRIMES = (1, 2654435761, 805459861, 3674653429)


def hash_corners(corner_coords: jax.Array, table_size: int, level_offsets: jax.Array) -> jax.Array:
    """Spatial hash of integer grid coordinates.

    Args:
        corner_coords: int32 [..., L, d] per-level integer corner coordinates.
        table_size: hash table entries per level (power of two).
        level_offsets: int32 [L] offsets (level * table_size).

    Returns:
        int32 [..., L] indices into the concatenated per-level table.
    """
    d = corner_coords.shape[-1]
    x = corner_coords[..., 0].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[0])
    for i in range(1, d):
        x = x ^ (corner_coords[..., i].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[i]))
    x = x & jnp.uint32(table_size - 1)
    return x.astype(jnp.int32) + level_offsets


def corner_index(
    coords: jax.Array, table_size: int, level_offsets: jax.Array, dense_sides: Optional[tuple] = None
) -> jax.Array:
    """Per-level table row index for integer corner coords [..., L, d].

    Levels with dense_sides[l] > 0 use COLLISION-FREE dense row-major
    indexing (sum_i coords_i * side^i) — tcnn's actual behavior when a
    level's grid fits the table (the reference's torch fallback hashes every
    level; the default dense_sides=None matches that). Hashed levels use the
    spatial hash."""
    hashed = hash_corners(coords, table_size, level_offsets)
    if dense_sides is None or not any(dense_sides):
        return hashed
    d = coords.shape[-1]
    sides = jnp.asarray(dense_sides, jnp.int32)  # [L], 0 = hashed
    dense = jnp.zeros_like(coords[..., 0])
    stride = jnp.ones_like(sides)
    for i in range(d):
        dense = dense + coords[..., i] * stride
        stride = stride * jnp.maximum(sides, 1)
    dense = dense + level_offsets
    return jnp.where(sides > 0, dense, hashed)


def _corner_indices_and_weights(
    p: jax.Array, scalings: jax.Array, table_size: int, num_levels: int, d: int,
    dense_sides: Optional[tuple] = None,
):
    """Flat element indices + interpolation weights for all corners.

    Args:
        p: [N, d] positions in [0, 1].

    Returns:
        idx [N, 2^d * L] int32 row indices into the [L*T] table,
        w [N, 2^d * L] interpolation weights.
    """
    level_offsets = jnp.arange(num_levels, dtype=jnp.int32) * table_size
    scaled = p[:, None, :] * scalings[:, None]  # [N, L, d]
    floored = jnp.floor(scaled)
    offset = scaled - floored  # [N, L, d]
    base = floored.astype(jnp.int32)

    idx_parts, w_parts = [], []
    for corner in range(2**d):
        bits = [(corner >> i) & 1 for i in range(d)]
        coords = base + jnp.asarray(bits, jnp.int32)
        idx = corner_index(coords, table_size, level_offsets, dense_sides)  # [N, L]
        w = jnp.ones(offset.shape[:-1], offset.dtype)
        for i, bit in enumerate(bits):
            w = w * (offset[..., i] if bit else (1 - offset[..., i]))
        idx_parts.append(idx)
        w_parts.append(w)
    idx = jnp.concatenate(idx_parts, axis=-1)  # [N, 2^d * L]
    w = jnp.concatenate(w_parts, axis=-1)
    return idx, w


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def hash_encode(
    positions_flat: jax.Array,
    table_flat: jax.Array,
    scalings: tuple,
    table_size: int,
    num_levels: int,
    features_per_level: int,
    n_input_dims: int,
    dense_sides: tuple = None,
) -> jax.Array:
    """Multiresolution hash encoding with a single combined gather.

    Args:
        positions_flat: [N * d] flat positions in [0, 1] (1-D to avoid lane
            padding on residuals).
        table_flat: [L * T * F] flat table.

    Returns:
        [N, L * F] features.
    """
    out, _ = _hash_encode_fwd(
        positions_flat, table_flat, scalings, table_size, num_levels, features_per_level, n_input_dims,
        dense_sides,
    )
    return out


def _gather_corner_features(positions_flat, table_flat, scalings, table_size, num_levels, features_per_level, d,
                            dense_sides=None):
    N = positions_flat.shape[0] // d
    L, F = num_levels, features_per_level
    p = positions_flat.reshape(N, d)
    scal = jnp.asarray(scalings, p.dtype)
    idx, w = _corner_indices_and_weights(p, scal, table_size, L, d, dense_sides)  # [N, 2^d*L]
    if F > 1:
        elem_idx = (idx[..., None] * F + jnp.arange(F, dtype=jnp.int32)).reshape(N, -1)  # [N, 2^d*L*F]
    else:
        elem_idx = idx
    gathered = table_flat[elem_idx]  # [N, 2^d*L*F] — the one wide gather
    return gathered, idx, elem_idx, w


def _hash_encode_fwd(positions_flat, table_flat, scalings, table_size, num_levels, features_per_level, d,
                     dense_sides=None):
    N = positions_flat.shape[0] // d
    L, F = num_levels, features_per_level
    gathered, _idx, _eidx, w = _gather_corner_features(
        positions_flat, table_flat, scalings, table_size, num_levels, features_per_level, d, dense_sides
    )
    # Residual for the backward's position gradient. Under remat the policy
    # decides its fate: save_only_these_names(... 'hashgrid_corners') stores
    # it (no backward table access); otherwise the backward recompute
    # re-runs the one wide gather (same bytes as the 8 per-corner regathers
    # it replaces, in a single op). NOTE: outside any remat scope (the
    # nff_remat=False fallback, or a direct jax.grad over hash_encode) this
    # residual [N, 2^d*L*F] is materialized unconditionally — that path now
    # trades ~N*2^d*L*F*dtype bytes of activation memory for skipping the
    # backward regather, versus the pre-r4 regather-in-backward design.
    gathered = checkpoint_name(gathered, "hashgrid_corners")
    n_corners = 2**d
    w_exp = jnp.repeat(w, F, axis=-1) if F > 1 else w  # [N, 2^d*L*F]
    weighted = (gathered * w_exp).reshape(N, n_corners, L * F)
    out = weighted.sum(axis=1)  # [N, L*F]
    return out, (positions_flat, table_flat, gathered)


def _hash_encode_bwd(scalings, table_size, num_levels, features_per_level, d, dense_sides, residuals, g):
    """Backward: recompute indices/weights, scatter-add table grad, read the
    corner features for the position grad from the residual (whose
    save-vs-regather fate the remat policy controls — module docstring)."""
    positions_flat, table_flat, gathered = residuals
    N = positions_flat.shape[0] // d
    L, F = num_levels, features_per_level
    n_corners = 2**d
    p = positions_flat.reshape(N, d)
    scal = jnp.asarray(scalings, p.dtype)
    corner_feats = gathered.reshape(N, n_corners, L, F)

    scaled = p[:, None, :] * scal[:, None]  # [N, L, d]
    floored = jnp.floor(scaled)
    offset = scaled - floored
    base = floored.astype(jnp.int32)
    level_offsets = jnp.arange(L, dtype=jnp.int32) * table_size

    g = g.astype(table_flat.dtype)  # [N, L*F]
    g_lf = g.reshape(N, L, F)

    d_table = jnp.zeros_like(table_flat)
    d_offset = jnp.zeros_like(offset)  # [N, L, d]

    for corner in range(n_corners):
        bits = [(corner >> i) & 1 for i in range(d)]
        coords = base + jnp.asarray(bits, jnp.int32)
        idx = corner_index(coords, table_size, level_offsets, dense_sides)  # [N, L]
        # weight and its partials
        w = jnp.ones(offset.shape[:-1], offset.dtype)
        for i, bit in enumerate(bits):
            w = w * (offset[..., i] if bit else (1 - offset[..., i]))
        if F > 1:
            eidx = (idx[..., None] * F + jnp.arange(F, dtype=jnp.int32)).reshape(N, L * F)
        else:
            eidx = idx
        # table gradient: dL/dtable[eidx] += g * w
        upd = (g_lf * w[..., None]).reshape(N, L * F)
        d_table = d_table.at[eidx.reshape(-1)].add(upd.reshape(-1))
        # position gradient: dL/do_i = sum_F g * f_c * dw/do_i
        f_c = corner_feats[:, corner]  # [N, L, F] from the residual
        gf = (g_lf * f_c).sum(-1)  # [N, L]
        for i, bit in enumerate(bits):
            dw_doi = jnp.ones_like(w)
            for j, bj in enumerate(bits):
                if j == i:
                    continue
                dw_doi = dw_doi * (offset[..., j] if bj else (1 - offset[..., j]))
            sign = 1.0 if bit else -1.0
            d_offset = d_offset.at[..., i].add(sign * gf * dw_doi)

    # d scaled = d offset; d p = sum_L d_scaled * scaling_l
    d_p = (d_offset * scal[:, None]).sum(axis=1)  # [N, d]
    return d_p.reshape(-1), d_table


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# ---------------------------------------------------------------------------
# Packed-cell dense levels (VERDICT r4 item 3 — the XLA formulation of the
# "VMEM-resident low levels" attack on transaction amplification)
# ---------------------------------------------------------------------------
#
# The random hashgrid gathers read 2^d separate F-element rows per
# (point, level): 8 bytes each at F=4 bf16 against >=32-byte HBM
# transactions — ~4x physical amplification (docs/PERFORMANCE.md). A Pallas
# VMEM-resident gather is infeasible on this toolchain (no Mosaic vector
# gather — tools/probe_mosaic_gather.py), so the XLA formulation instead
# RESHAPES THE TRAFFIC: for low-resolution levels whose CELL count fits a
# budget, a per-step "packed cell table" stores all 2^d corner features of
# each cell contiguously (64 B at d=3/F=4 — transaction-width), and every
# forward-direction read (the forward pass AND the save_grid remat
# recompute in the backward) issues ONE aligned slice-read per
# (point, level) instead of 2^d sub-width reads. Same bytes counted, ~4x
# fewer HBM transactions on those passes.
#
# The packed table is DERIVED (pack_cells) from the canonical flat table —
# numerics are bit-identical to the unpacked path, hash collisions included
# (colliding cells read the same canonical rows). It is a FORWARD-ONLY read
# cache under stop_gradient: the encode VJP scatters the table cotangent in
# canonical coordinates (the baseline native-scatter pattern), because
# routing it through the pack's autodiff transpose — a duplicate-index
# cell->canonical scatter — made XLA:TPU emit a 124M-element
# sort+segment-reduce (~17x the step's counted bytes). Compute the pack
# OUTSIDE the nff chunk scan (the model passes it into the scanned core as
# a loop constant) so it runs once per step, not once per chunk.


def packed_prefix_sides(scalings, d: int, max_cells: int):
    """Per-level packed cell-grid sides: the largest PREFIX of levels whose
    cell count (side^d, side = floor(scaling) + 1) fits max_cells; 0 beyond.
    A prefix (levels are resolution-sorted) keeps level order contiguous so
    the packed/hashed outputs concatenate without a permutation."""
    sides = []
    for s in scalings:
        side = int(s) + 1
        if side**d <= max_cells and len(sides) == len([x for x in sides if x]):
            sides.append(side)
        else:
            sides.append(0)
    # zero out anything after the first 0 (prefix property)
    out, alive = [], True
    for side in sides:
        alive = alive and side > 0
        out.append(side if alive else 0)
    return tuple(out)


def _packed_cell_offsets(packed_sides, d: int):
    """Cumulative cell offsets per packed level (static python ints)."""
    offs, total = [], 0
    for side in packed_sides:
        if side == 0:
            break
        offs.append(total)
        total += side**d
    return offs, total


def pack_cells(table_flat: jax.Array, scalings, table_size: int, num_levels: int,
               features_per_level: int, d: int, dense_sides, packed_sides) -> jax.Array:
    """Canonical flat table -> packed per-cell corner table.

    Returns [total_cells * 2^d * F] flat; cell row layout [corner][feature]
    (64 contiguous bytes at d=3, F=4, bf16). Differentiable: its autodiff
    transpose is the fold-back scatter that merges packed-cell cotangents
    into the canonical table (collision-correct by construction)."""
    F = features_per_level
    parts = []
    for level, side in enumerate(packed_sides):
        if side == 0:
            break
        # cell coords [side^d, d] generated ON DEVICE (broadcasted iotas,
        # last axis fastest — matching _cell_rows): embedding them as numpy
        # constants put ~8 x cells x d x 4 B of literals into the program,
        # which overflowed the remote-compile relay's request limit
        axes = jnp.meshgrid(*([jnp.arange(side, dtype=jnp.int32)] * d), indexing="ij")
        coords = jnp.stack([a.reshape(-1) for a in axes], axis=-1)  # [side^d, d]
        level_offsets = jnp.asarray([level * table_size], jnp.int32)
        level_dense = None if dense_sides is None else (dense_sides[level],)
        corner_rows = []
        for corner in range(2**d):
            bits = jnp.asarray([(corner >> i) & 1 for i in range(d)], jnp.int32)
            cc = (coords + bits)[:, None, :]  # [side^d, 1, d]
            idx = corner_index(cc, table_size, level_offsets, level_dense)[:, 0]  # [side^d]
            corner_rows.append(idx)
        rows = jnp.stack(corner_rows, axis=-1)  # [side^d, 2^d]
        if F > 1:
            eidx = (rows[..., None] * F + jnp.arange(F, dtype=jnp.int32)).reshape(-1)
        else:
            eidx = rows.reshape(-1)
        # FLAT 1-D gather: a [side^d, 2^d*F] output pads its 32-lane minor
        # dim to 128 — 4x the buffer and 4x this backend's per-padded-element
        # gather charge (docs/PERFORMANCE.md "Cost-model gather charging")
        parts.append(table_flat[eidx])  # [side^d * 2^d * F], cell-major
    return jnp.concatenate(parts, axis=0)


def _gather_cell_rows(packed_flat: jax.Array, rows: jax.Array, W: int) -> jax.Array:
    """Gather whole cell rows: rows [N, k] -> [N, k, W].

    ONE wide elementwise gather (eidx = row*W + arange(W)) on the flat 1-D
    operand — the exact op class of the baseline combined gather, which XLA
    TPU lowers natively. The W addresses of a cell are CONSECUTIVE, so each
    (point, level) read covers one aligned 64 B span (2 HBM transactions at
    d=3/F=4/bf16) instead of 2^d scattered sub-width reads. (A
    slice_sizes=(W,) lax.gather expressed the same access but fell off
    XLA:TPU's native-gather pattern into the gather-expander slow path —
    +2.2 TB counted bytes on the real-TPU cost model, 2026-08-21.)"""
    N, k = rows.shape
    eidx = (rows[..., None] * W + jnp.arange(W, dtype=jnp.int32)).reshape(N, k * W)
    return packed_flat[eidx].reshape(N, k, W)


def _cell_rows(base: jax.Array, packed_sides, d: int) -> jax.Array:
    """Row-major packed-cell row per (point, packed level).

    base: int32 [N, L, d] floored level coords. Coords are clamped into the
    cell grid (the encoding's contract is positions in [0, 1]; clamping only
    guards numerical overshoot, matching the dense_low_levels contract)."""
    offs, _total = _packed_cell_offsets(packed_sides, d)
    rows = []
    for level, side in enumerate(packed_sides):
        if side == 0:
            break
        c = jnp.clip(base[:, level, :], 0, side - 1)  # [N, d]
        # row-major with the LAST axis fastest — pack_cells' meshgrid(...,
        # indexing="ij").reshape(-1) enumeration
        row = jnp.zeros_like(c[:, 0])
        for i in range(d):
            row = row * side + c[:, i]
        rows.append(row + offs[level])
    return jnp.stack(rows, axis=-1)  # [N, k]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def hash_encode_packed(
    positions_flat: jax.Array,
    table_flat: jax.Array,
    packed_flat: jax.Array,
    scalings: tuple,
    table_size: int,
    num_levels: int,
    features_per_level: int,
    n_input_dims: int,
    dense_sides: tuple,
    packed_sides: tuple,
) -> jax.Array:
    """hash_encode with the leading packed_sides-prefix levels served from
    the packed cell table (one W-slice gather per point-level) and the
    remaining levels from the canonical combined gather. Bit-identical
    outputs to hash_encode (the packed rows hold the same canonical values).
    """
    out, _ = _hash_encode_packed_fwd(
        positions_flat, table_flat, packed_flat, scalings, table_size, num_levels,
        features_per_level, n_input_dims, dense_sides, packed_sides,
    )
    return out


def _packed_geom(p, scalings, num_levels, d):
    scal = jnp.asarray(scalings, p.dtype)
    scaled = p[:, None, :] * scal[:, None]  # [N, L, d]
    floored = jnp.floor(scaled)
    return floored.astype(jnp.int32), scaled - floored, scal


def _corner_weights(offset: jax.Array, d: int) -> jax.Array:
    """Interpolation weights [N, 2^d, L] from per-axis offsets [N, L, d]."""
    ws = []
    for corner in range(2**d):
        bits = [(corner >> i) & 1 for i in range(d)]
        w = jnp.ones(offset.shape[:-1], offset.dtype)
        for i, bit in enumerate(bits):
            w = w * (offset[..., i] if bit else (1 - offset[..., i]))
        ws.append(w)
    return jnp.stack(ws, axis=1)  # [N, 2^d, L]


def _hash_encode_packed_fwd(positions_flat, table_flat, packed_flat, scalings, table_size,
                            num_levels, features_per_level, d, dense_sides, packed_sides):
    N = positions_flat.shape[0] // d
    L, F = num_levels, features_per_level
    n_corners = 2**d
    W = n_corners * F
    k = sum(1 for s in packed_sides if s > 0)
    p = positions_flat.reshape(N, d)
    base, offset, _scal = _packed_geom(p, scalings, L, d)
    w = _corner_weights(offset, d)  # [N, 2^d, L]

    # ---- packed prefix levels: one aligned W-slice per (point, level)
    rows = _cell_rows(base, packed_sides, d)  # [N, k]
    gathered_p = _gather_cell_rows(packed_flat, rows, W)  # [N, k, W]
    gathered_p = checkpoint_name(gathered_p, "hashgrid_corners")
    feats_p = gathered_p.reshape(N, k, n_corners, F)
    out_p = jnp.einsum("nlcf,ncl->nlf", feats_p, w[:, :, :k]).reshape(N, k * F)

    # ---- remaining hashed/dense levels: the canonical combined gather
    if k < L:
        level_offsets = (jnp.arange(k, L, dtype=jnp.int32)) * table_size
        tail_dense = None if dense_sides is None else tuple(dense_sides[k:])
        idx_parts = []
        for corner in range(n_corners):
            bits = [(corner >> i) & 1 for i in range(d)]
            coords = base[:, k:, :] + jnp.asarray(bits, jnp.int32)
            idx_parts.append(corner_index(coords, table_size, level_offsets, tail_dense))
        idx = jnp.concatenate(idx_parts, axis=-1)  # [N, 2^d*(L-k)]
        if F > 1:
            eidx = (idx[..., None] * F + jnp.arange(F, dtype=jnp.int32)).reshape(N, -1)
        else:
            eidx = idx
        gathered_h = table_flat[eidx]  # [N, 2^d*(L-k)*F]
        gathered_h = checkpoint_name(gathered_h, "hashgrid_corners")
        feats_h = gathered_h.reshape(N, n_corners, L - k, F)
        out_h = jnp.einsum("nclf,ncl->nlf", feats_h, w[:, :, k:]).reshape(N, (L - k) * F)
        out = jnp.concatenate([out_p, out_h], axis=-1)
    else:
        gathered_h = jnp.zeros((N, 0), table_flat.dtype)
        out = out_p
    return out, (positions_flat, table_flat, packed_flat, gathered_p, gathered_h)


def _hash_encode_packed_bwd(scalings, table_size, num_levels, features_per_level, d,
                            dense_sides, packed_sides, residuals, g):
    positions_flat, table_flat, packed_flat, gathered_p, gathered_h = residuals
    N = positions_flat.shape[0] // d
    L, F = num_levels, features_per_level
    n_corners = 2**d
    W = n_corners * F
    k = sum(1 for s in packed_sides if s > 0)
    p = positions_flat.reshape(N, d)
    base, offset, scal = _packed_geom(p, scalings, L, d)
    w = _corner_weights(offset, d)  # [N, 2^d, L]

    g = g.astype(table_flat.dtype)
    g_lf = g.reshape(N, L, F)

    # ---- table cotangent, ALL levels, directly in CANONICAL coordinates —
    # the baseline per-corner scatter-add pattern (native bf16 scatters on
    # TPU). The packed table is a FORWARD-ONLY read cache: its cotangent is
    # zero, so the pack and its transpose are dead in the backward and XLA
    # DCEs them. (Routing the packed levels' cotangent through the pack
    # transpose instead made XLA lower the duplicate-index cell->canonical
    # scatter as a 124M-element sort+segment-reduce — ~17x the program's
    # counted bytes on the real-TPU cost model.)
    d_table = jnp.zeros_like(table_flat)
    level_offsets = jnp.arange(L, dtype=jnp.int32) * table_size
    for corner in range(n_corners):
        bits = [(corner >> i) & 1 for i in range(d)]
        coords = base + jnp.asarray(bits, jnp.int32)
        idx = corner_index(coords, table_size, level_offsets, dense_sides)  # [N, L]
        if F > 1:
            eidx = (idx[..., None] * F + jnp.arange(F, dtype=jnp.int32)).reshape(N, L * F)
        else:
            eidx = idx
        upd = (g_lf * w[:, corner, :, None]).reshape(N, L * F)
        d_table = d_table.at[eidx.reshape(-1)].add(upd.reshape(-1))
    d_packed = jnp.zeros_like(packed_flat)

    # ---- position gradient from the saved corner features (both groups)
    feats_p = gathered_p.reshape(N, k, n_corners, F).transpose(0, 2, 1, 3)  # [N, 2^d, k, F]
    if k < L:
        feats_h = gathered_h.reshape(N, n_corners, L - k, F)
        corner_feats = jnp.concatenate([feats_p, feats_h], axis=2)  # [N, 2^d, L, F]
    else:
        corner_feats = feats_p
    d_offset = jnp.zeros_like(offset)  # [N, L, d]
    for corner in range(n_corners):
        bits = [(corner >> i) & 1 for i in range(d)]
        gf = (g_lf * corner_feats[:, corner]).sum(-1)  # [N, L]
        for i, bit in enumerate(bits):
            dw_doi = jnp.ones(offset.shape[:-1], offset.dtype)
            for j, bj in enumerate(bits):
                if j == i:
                    continue
                dw_doi = dw_doi * (offset[..., j] if bj else (1 - offset[..., j]))
            sign = 1.0 if bit else -1.0
            d_offset = d_offset.at[..., i].add(sign * gf * dw_doi)
    d_p = (d_offset * scal[:, None]).sum(axis=1)
    return d_p.reshape(-1), d_table, d_packed


hash_encode_packed.defvjp(_hash_encode_packed_fwd, _hash_encode_packed_bwd)


def cast_hash_tables(params, dtype) -> dict:
    """Cast every ``hash_table`` leaf of a param tree to ``dtype``.

    Calling this ONCE on the param tree before ``model.apply`` hoists the
    f32->compute_dtype table cast out of the ``nff_chunks`` remat scan: the
    in-module ``astype`` then sees an already-cast table and is a no-op.
    Measured on the full train step (tools/hlo_table_traffic.py): the in-scan
    cast executes once per chunk (8 x 0.81 GB HBM on the 537 MB static table)
    and makes the scan accumulate the table cotangent in f32 (8 x ~1.6 GB
    scatter+add) — hoisting removes the per-chunk casts and accumulates in
    ``dtype`` instead, cutting ~40% of the step's ray-independent HBM
    traffic (docs/PERFORMANCE.md "Full-step roofline")."""

    def f(path, x):
        if path and getattr(path[-1], "key", None) == "hash_table":
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(f, params)


class HashEncoding(nn.Module):
    """Multiresolution hash grid encoding (Instant-NGP).

    cf. reference HashEncoding (encodings.py:311). Supports 3D and 4D inputs
    (4D is the per-actor grid with actor index as the 4th coordinate,
    cf. neurad_encoding.py:282-293).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 0.001
    n_input_dims: int = 3
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: Optional[jnp.dtype] = None
    """If set (e.g. bf16), the table is cast once before gathering — halving
    the HBM gather bandwidth, the dominant cost of hash encoding on TPU."""
    dense_low_levels: bool = False
    """Collision-free dense indexing for levels whose full grid fits the
    per-level table (tcnn's actual behavior; the reference's torch fallback —
    and this default — hashes every level)."""
    packed_dense_cells: bool = False
    """Serve low-resolution levels from a per-step PACKED CELL TABLE (all
    2^d corner features of a cell contiguous): one transaction-width slice
    read per (point, level) instead of 2^d sub-width random reads — the XLA
    formulation of the VMEM-resident low-level path (module comment above
    pack_cells; numerics bit-identical to the unpacked gather). Callers
    should pass a hoisted ``packed=`` table (packed_cells()) computed
    OUTSIDE any chunk scan; composes with dense_low_levels and
    compute_dtype."""
    packed_max_cells: int = 2**22
    """Cell-count budget per level for packing (8x storage on packed levels:
    2^19 cells * 2^d * F at d=3/F=4/bf16 = 34 MB)."""

    def setup(self):
        levels = np.arange(self.num_levels)
        if self.num_levels > 1:
            growth = math.exp((math.log(self.max_res) - math.log(self.min_res)) / (self.num_levels - 1))
        else:
            growth = 1.0
        self.growth_factor = growth
        # Per-level resolutions, cf. encodings.py:350 (floor of geometric
        # spacing). The reference computes min_res * growth**levels in
        # FLOAT32 (torch promotes the python-scalar growth factor to the
        # default dtype) before flooring; float64 math floors e.g.
        # 4 * exp(ln(16)) = 63.99999... to 63 where f32 rounds to exactly 64
        # — executed-reference parity (tests/test_reference_parity.py)
        # requires the f32 arithmetic.
        self.scalings = tuple(
            np.floor(
                np.float32(self.min_res) * np.power(np.float32(growth), levels.astype(np.float32))
            ).astype(np.float32).tolist()
        )
        self.table_size = 2**self.log2_hashmap_size
        if self.dense_low_levels:
            # corner coords reach floor(scaling)+1, so the dense side length
            # is floor(scaling)+2; a level is dense iff side^d rows fit its
            # table slot
            sides = [int(s) + 2 for s in self.scalings]
            self.dense_sides = tuple(
                side if side**self.n_input_dims <= self.table_size else 0 for side in sides
            )
        else:
            self.dense_sides = None
        if self.packed_dense_cells:
            self.packed_sides = packed_prefix_sides(
                self.scalings, self.n_input_dims, self.packed_max_cells
            )
        else:
            self.packed_sides = None
        n = self.table_size * self.num_levels * self.features_per_level
        self.hash_table = self.param(
            "hash_table",
            lambda key, shape: (jax.random.uniform(key, shape, self.param_dtype) * 2 - 1) * self.hash_init_scale,
            (n,),
        )

    def get_out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def has_packed_levels(self) -> bool:
        return self.packed_sides is not None and any(self.packed_sides)

    def packed_cells(self) -> Optional[jax.Array]:
        """The derived packed cell table for this grid's prefix levels (None
        when packing is off or no level fits the budget). Compute ONCE per
        step outside any chunk scan and pass to __call__(packed=...) — see
        the pack_cells module comment for why hoisting is load-bearing."""
        if not self.has_packed_levels:
            return None
        table = self.hash_table
        if self.compute_dtype is not None:
            table = table.astype(self.compute_dtype)
        # stop_gradient: the packed table is a forward-only read cache — the
        # encode VJP scatters the table cotangent in CANONICAL coordinates
        # (hash_encode_packed bwd), so no gradient may route through the
        # pack (whose transpose XLA lowers as a huge sort-based scatter)
        return jax.lax.stop_gradient(pack_cells(
            table, self.scalings, self.table_size, self.num_levels,
            self.features_per_level, self.n_input_dims, self.dense_sides, self.packed_sides,
        ))

    def __call__(self, positions: jax.Array, packed: Optional[jax.Array] = None) -> jax.Array:
        """Encode positions in [0, 1]^d: [..., d] -> [..., L*F]."""
        d = self.n_input_dims
        assert positions.shape[-1] == d, f"expected {d}-D input, got {positions.shape}"
        batch_shape = positions.shape[:-1]
        table = self.hash_table
        pos_dtype = positions.dtype
        if self.compute_dtype is not None:
            table = table.astype(self.compute_dtype)
            positions = positions.astype(self.compute_dtype)
        if self.has_packed_levels:
            if packed is None:
                # fallback for direct use/tests; production callers hoist
                packed = self.packed_cells().astype(table.dtype)
            out = hash_encode_packed(
                positions.reshape(-1),
                table,
                packed.astype(table.dtype),
                self.scalings,
                self.table_size,
                self.num_levels,
                self.features_per_level,
                d,
                self.dense_sides,
                self.packed_sides,
            )
        else:
            out = hash_encode(
                positions.reshape(-1),
                table,
                self.scalings,
                self.table_size,
                self.num_levels,
                self.features_per_level,
                d,
                self.dense_sides,
            )
        # checkpoint tag: inert unless the surrounding remat uses a
        # save_only_these_names policy (models/neuradar.py nff_remat_policy
        # "save_grid" keeps gather outputs instead of re-gathering in bwd)
        out = checkpoint_name(out, "hashgrid_out")
        return out.reshape(*batch_shape, self.get_out_dim()).astype(pos_dtype)


class SHEncoding(nn.Module):
    """Spherical harmonics direction encoding (levels 1..4).

    cf. reference SHEncoding (encodings.py:760) and
    components_from_spherical_harmonics (utils/math.py:31).
    """

    levels: int = 4

    def get_out_dim(self) -> int:
        return self.levels**2

    @nn.compact
    def __call__(self, directions: jax.Array) -> jax.Array:
        x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
        xx, yy, zz = x * x, y * y, z * z
        comps = [jnp.full_like(x, 0.28209479177387814)]
        if self.levels > 1:
            comps += [
                0.4886025119029199 * y,
                0.4886025119029199 * z,
                0.4886025119029199 * x,
            ]
        if self.levels > 2:
            comps += [
                1.0925484305920792 * x * y,
                1.0925484305920792 * y * z,
                0.9461746957575601 * zz - 0.31539156525251999,
                1.0925484305920792 * x * z,
                0.5462742152960396 * (xx - yy),
            ]
        if self.levels > 3:
            comps += [
                0.5900435899266435 * y * (3 * xx - yy),
                2.890611442640554 * x * y * z,
                0.4570457994644658 * y * (5 * zz - 1),
                0.3731763325901154 * z * (5 * zz - 3),
                0.4570457994644658 * x * (5 * zz - 1),
                1.445305721320277 * z * (xx - yy),
                0.5900435899266435 * x * (xx - 3 * yy),
            ]
        return jnp.stack(comps, axis=-1)


class NeRFEncoding(nn.Module):
    """Classic NeRF sinusoidal frequency encoding (cf. encodings.py:84)."""

    in_dim: int = 3
    num_frequencies: int = 10
    min_freq_exp: float = 0.0
    max_freq_exp: float = 8.0
    include_input: bool = False

    def get_out_dim(self) -> int:
        out = self.in_dim * self.num_frequencies * 2
        if self.include_input:
            out += self.in_dim
        return out

    @nn.compact
    def __call__(self, in_tensor: jax.Array) -> jax.Array:
        scaled = 2 * jnp.pi * in_tensor
        freqs = 2 ** jnp.linspace(self.min_freq_exp, self.max_freq_exp, self.num_frequencies)
        scaled = scaled[..., None] * freqs  # [..., d, F]
        scaled = scaled.reshape(*in_tensor.shape[:-1], -1)
        enc = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
        if self.include_input:
            enc = jnp.concatenate([enc, in_tensor], axis=-1)
        return enc
