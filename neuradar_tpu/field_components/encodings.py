"""Input encodings: multiresolution hash grids and spherical harmonics.

TPU-native replacement for tiny-cuda-nn (reference
nerfstudio/field_components/encodings.py:311-471 is the behavioral spec via
its pure-torch fallback). The hash function here is bit-compatible with that
spec: products are taken in uint32 (wraparound), and because the table size is
a power of two dividing 2^32, the low log2(T) bits — the only ones that
survive the modulo — are identical to the reference's int64 arithmetic.

The forward pass is a dense gather + multilinear interpolation over 2^d
corners vectorized across levels; XLA lowers the gathers efficiently on TPU
and a Pallas fast path can be swapped in via ``neuradar_tpu.ops``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

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


class HashEncoding(nn.Module):
    """Multiresolution hash grid encoding (Instant-NGP).

    cf. reference HashEncoding (encodings.py:311). Supports 3D and 4D inputs
    (4D is used for the per-actor grid with actor index as the 4th coord,
    cf. neurad_encoding.py:282-293).

    Attributes:
        num_levels: number of resolution levels.
        min_res / max_res: coarsest / finest grid resolution.
        log2_hashmap_size: log2 of per-level table entries.
        features_per_level: feature width per level.
        n_input_dims: 3 or 4.
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 0.001
    n_input_dims: int = 3
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        levels = np.arange(self.num_levels)
        if self.num_levels > 1:
            growth = math.exp((math.log(self.max_res) - math.log(self.min_res)) / (self.num_levels - 1))
        else:
            growth = 1.0
        self.growth_factor = growth
        # Per-level resolutions, cf. encodings.py:350 (floor of geometric spacing)
        self.scalings = np.floor(self.min_res * growth**levels).astype(np.float32)
        self.table_size = 2**self.log2_hashmap_size
        self.level_offsets = jnp.asarray(levels * self.table_size, dtype=jnp.int32)
        self.hash_table = self.param(
            "hash_table",
            lambda key, shape: (jax.random.uniform(key, shape, self.param_dtype) * 2 - 1) * self.hash_init_scale,
            (self.table_size * self.num_levels, self.features_per_level),
        )

    def get_out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def __call__(self, positions: jax.Array) -> jax.Array:
        """Encode positions in [0, 1]^d.

        Args:
            positions: [..., d] float positions.
        Returns:
            [..., num_levels * features_per_level] features.
        """
        d = self.n_input_dims
        assert positions.shape[-1] == d, f"expected {d}-D input, got {positions.shape}"
        scalings = jnp.asarray(self.scalings, positions.dtype)  # [L]
        scaled = positions[..., None, :] * scalings[:, None]  # [..., L, d]
        floored = jnp.floor(scaled)
        offset = scaled - floored  # [..., L, d]
        base = floored.astype(jnp.int32)

        out = None
        for corner in range(2**d):
            corner_bits = [(corner >> i) & 1 for i in range(d)]
            coords = base + jnp.asarray(corner_bits, jnp.int32)
            idx = hash_corners(coords, self.table_size, self.level_offsets)  # [..., L]
            feats = self.hash_table[idx]  # [..., L, F]
            w = jnp.ones(offset.shape[:-1], offset.dtype)
            for i, bit in enumerate(corner_bits):
                w = w * (offset[..., i] if bit else (1 - offset[..., i]))
            contrib = feats * w[..., None]
            out = contrib if out is None else out + contrib
        return out.reshape(*positions.shape[:-1], self.num_levels * self.features_per_level)


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
