"""Radar decoder: transformer encoder over a radar scan's rays, grounded in
NeRF geometry via a sine positional embedding of the predicted world points.

cf. reference nerfstudio/detr/models/transformer.py:32-67 (1-layer pre-norm
encoder, d_model=48, nhead=1, ff=64) and
nerfstudio/detr/models/position_encoding_3d.py:26-99 (sine embedding), plus
the head assembly at models/neuradar.py:250-278 and :464-492.

Tokens are [num_scans, rays_per_scan, d_model] — batched attention over a few
thousand tokens per scan, a single fused attention on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.field_components.mlp import MLP


def sine_position_embedding(xyz: jax.Array, num_channels: int, temperature: float = 10000.0) -> jax.Array:
    """Sine/cosine positional embedding of 3D coordinates.

    cf. PositionEmbeddingCoordsSine.get_sine_embeddings
    (position_encoding_3d.py:56-99) with pos_type="sine", scale=2*pi.

    Args:
        xyz: [N, nr, 3] coordinates.
        num_channels: output embedding width (split across the 3 dims).

    Returns:
        [N, nr, num_channels] embedding (no gradient — positional only).
    """
    xyz = jax.lax.stop_gradient(xyz)
    d_in = xyz.shape[-1]
    ndim = num_channels // d_in
    if ndim % 2 != 0:
        ndim -= 1
    rems = num_channels - ndim * d_in

    embeds = []
    for d in range(d_in):
        cdim = ndim
        if rems > 0:
            cdim += 2
            rems -= 2
        dim_t = jnp.arange(cdim, dtype=xyz.dtype)
        dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / cdim)
        pos = xyz[..., d] * (2 * jnp.pi)
        pos = pos[..., None] / dim_t  # [N, nr, cdim]
        interleaved = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)
        embeds.append(interleaved.reshape(*pos.shape[:-1], -1))
    return jnp.concatenate(embeds, axis=-1)


class FusedSelfAttention(nn.Module):
    """MultiHeadDotProductAttention drop-in whose attention core is the
    Pallas fused kernel (ops/attention.py): scores never materialize in HBM.

    The q/k/v/out projections are DenseGenerals with flax MHA's exact
    submodule names and kernel shapes, so parameter trees (and checkpoints)
    are interchangeable with the flax implementation.
    """

    num_heads: int = 1
    qkv_features: int = 48
    out_features: int = 48
    dropout_rate: float = 0.0
    interpret: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs_q: jax.Array, inputs_k: jax.Array, inputs_v: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        from neuradar_tpu.ops.attention import fused_self_attention

        H = self.num_heads
        assert self.qkv_features % H == 0, (
            f"qkv_features {self.qkv_features} not divisible by num_heads {H}"
        )  # mirrors flax MHA; keeps parameter trees interchangeable
        Dh = self.qkv_features // H
        proj = lambda name: nn.DenseGeneral(features=(H, Dh), dtype=self.dtype, name=name)
        q = proj("query")(inputs_q)  # [B, S, H, Dh]
        k = proj("key")(inputs_k)
        v = proj("value")(inputs_v)

        B, S = q.shape[0], q.shape[1]
        fold = lambda x: jnp.swapaxes(x, 1, 2).reshape(B * H, S, Dh)
        rate = 0.0 if deterministic else self.dropout_rate
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (), 0, 2**31 - 1, jnp.int32)
        else:
            seed = 0
        out = fused_self_attention(fold(q), fold(k), fold(v), seed, rate, None, self.interpret)
        out = jnp.swapaxes(out.reshape(B, H, S, Dh), 1, 2)  # [B, S, H, Dh]
        return nn.DenseGeneral(features=self.out_features, axis=(-2, -1), dtype=self.dtype,
                               name="out")(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm encoder layer with positional embedding added to q/k only."""

    d_model: int = 48
    nhead: int = 1
    dim_feedforward: int = 64
    dropout: float = 0.1
    attn_impl: str = "flax"
    """'flax' (XLA MultiHeadDotProductAttention), 'pallas' (fused VMEM
    kernel, ops/attention.py), or 'pallas_interpret' (CPU testing)."""
    dtype: Optional[jnp.dtype] = None
    """Compute dtype (params stay f32). Without it flax's dtype promotion
    silently upcasts bf16 activations to f32 against the f32 params —
    doubling the attention HBM traffic the fused kernel exists to cut."""

    @nn.compact
    def __call__(self, src: jax.Array, pos: jax.Array, train: bool = False) -> jax.Array:
        if self.dtype is not None:
            src = src.astype(self.dtype)
            pos = pos.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        qk = x + pos
        if self.attn_impl.startswith("pallas"):
            attn = FusedSelfAttention(
                num_heads=self.nhead, qkv_features=self.d_model, out_features=self.d_model,
                dropout_rate=self.dropout, interpret=self.attn_impl == "pallas_interpret",
                dtype=self.dtype, name="self_attn",
            )(inputs_q=qk, inputs_k=qk, inputs_v=x, deterministic=not train)
        else:
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead,
                qkv_features=self.d_model,
                out_features=self.d_model,
                dropout_rate=self.dropout,
                deterministic=not train,
                dtype=self.dtype,
                name="self_attn",
            )(inputs_q=qk, inputs_k=qk, inputs_v=x)
        src = src + nn.Dropout(self.dropout, deterministic=not train, name="drop1")(attn)

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(src)
        h = nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x))
        h = nn.Dropout(self.dropout, deterministic=not train, name="drop_ff")(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        src = src + nn.Dropout(self.dropout, deterministic=not train, name="drop2")(h)
        return src


class RadarTransformer(nn.Module):
    """Encoder stack with a final LayerNorm (normalize_before=True variant)."""

    d_model: int = 48
    nhead: int = 1
    num_layers: int = 1
    dim_feedforward: int = 64
    dropout: float = 0.1
    attn_impl: str = "flax"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src: jax.Array, pos: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_layers):
            src = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                attn_impl=self.attn_impl, dtype=self.dtype, name=f"layer_{i}"
            )(src, pos, train)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(src)


class RadarDecoder(nn.Module):
    """Full radar decoder: pos-embed + transformer + the four heads.

    Heads (cf. models/neuradar.py:251-278, :487-491):
      * offset: tanh * 1.5, added to the NeRF-geometry point,
      * existence probability: sigmoid,
      * uncertainty: softplus (per-axis Laplace scale),
      * angle: tanh (predicted, unused by the loss — parity with reference).

    Output layout per token: [ep, x, y, z, var_x, var_y, var_z] (+ angles
    returned separately), matching radar_utils.MultiBernoulli's expectations.
    """

    d_model: int = 48
    offset_scale: float = 1.5
    dropout: float = 0.1
    """Transformer dropout rate (cf. detr Transformer default)."""
    attn_impl: str = "flax"
    """Self-attention implementation (see TransformerEncoderLayer)."""
    dtype: Optional[jnp.dtype] = None
    """Transformer compute dtype (the heads and outputs stay f32)."""

    @nn.compact
    def __call__(
        self, features: jax.Array, geometry_xyz: jax.Array, train: bool = False
    ):
        """Args:
            features: [N, nr, C] rendered NFF features (+ appearance).
            geometry_xyz: [N, nr, 3] NeRF-geometry points (depth x direction,
                radar frame) used for the positional embedding and offsets.

        Returns:
            radar_output [N, nr, 7] and angles [N, nr, 2].
        """
        pos = sine_position_embedding(geometry_xyz, self.d_model)
        decoded = RadarTransformer(d_model=self.d_model, dropout=self.dropout,
                                   attn_impl=self.attn_impl,
                                   dtype=self.dtype, name="transformer")(features, pos, train)
        decoded = decoded.astype(jnp.float32)  # small heads in f32

        offset = self.offset_scale * MLP(out_dim=3, num_layers=3, layer_width=16, out_activation=jnp.tanh,
                                         name="offset_head")(decoded)
        xyz = geometry_xyz + offset
        ep = MLP(out_dim=1, num_layers=3, layer_width=16, out_activation=jax.nn.sigmoid,
                 name="existence_probability_head")(decoded)
        unc = MLP(out_dim=3, num_layers=3, layer_width=16, out_activation=jax.nn.softplus,
                  name="radar_uncertainty_head")(decoded)
        angles = MLP(out_dim=2, num_layers=3, layer_width=16, out_activation=jnp.tanh,
                     name="radar_angle_head")(decoded)
        radar_output = jnp.concatenate([ep, xyz, unc], axis=-1).astype(jnp.float32)
        return radar_output, angles


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer: query self-attn + cross-attn to ray memory.

    cf. the vendored DETR decoder (detr/models/transformer.py:95-141) used by
    the paper's set-based radar variant.
    """

    d_model: int = 48
    nhead: int = 1
    dim_feedforward: int = 64
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tgt, memory, query_pos, mem_pos, train: bool = False):
        if self.dtype is not None:
            tgt, memory = tgt.astype(self.dtype), memory.astype(self.dtype)
            query_pos, mem_pos = query_pos.astype(self.dtype), mem_pos.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        qk = x + query_pos
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dropout_rate=self.dropout,
            deterministic=not train, dtype=self.dtype, name="self_attn",
        )(inputs_q=qk, inputs_k=qk, inputs_v=x)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train, name="drop1")(sa)

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dropout_rate=self.dropout,
            deterministic=not train, dtype=self.dtype, name="cross_attn",
        )(inputs_q=x + query_pos, inputs_k=memory + mem_pos, inputs_v=memory)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train, name="drop2")(ca)

        x = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt)
        h = nn.relu(nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x))
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train, name="drop3")(h)
        return tgt


class SetRadarDecoder(nn.Module):
    """DETR-style set-based radar decoder.

    The paper's alternative detector (reference vendored detr/, used by the
    set-based variant; cf. detr/models/detr.py:40 + matcher.py:26): Q
    learnable object queries cross-attend to the per-ray NFF memory and each
    predicts one multi-Bernoulli component [ep, xyz, var]. The same auction/
    Hungarian association + MB loss applies with n_mb = num_queries.
    """

    d_model: int = 48
    num_queries: int = 300
    num_decoder_layers: int = 2
    nhead: int = 1
    dim_feedforward: int = 64
    dropout: float = 0.1
    position_scale: float = 100.0  # query positions regressed in meters / scale
    attn_impl: str = "flax"
    """Self-attention implementation for the ray-memory ENCODER (the
    quadratic cost); the Q x S decoder cross-attention stays flax."""
    aux_loss: bool = False
    """Deep supervision: also return every intermediate decoder layer's
    predictions through the SHARED norm + heads (cf. the reference's vendored
    DETR aux_loss, detr/models/detr.py:40,63-66)."""
    dtype: Optional[jnp.dtype] = None
    """Transformer compute dtype (the heads and outputs stay f32)."""

    @nn.compact
    def __call__(self, features: jax.Array, geometry_xyz: jax.Array, train: bool = False):
        """Args as RadarDecoder; returns radar_output [N, Q, 7], angles
        [N, Q, 2] (+ aux_outputs [D-1, N, Q, 7] when aux_loss)."""
        N = features.shape[0]
        mem_pos = sine_position_embedding(geometry_xyz, self.d_model)
        memory = RadarTransformer(d_model=self.d_model, nhead=self.nhead,
                                  dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                                  attn_impl=self.attn_impl, dtype=self.dtype,
                                  name="encoder")(features, mem_pos, train)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.d_model)
        )
        query_pos = jnp.broadcast_to(query_embed, (N, self.num_queries, self.d_model))
        tgt = jnp.zeros_like(query_pos)
        intermediates = []
        for i in range(self.num_decoder_layers):
            tgt = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"layer_{i}"
            )(tgt, memory, query_pos, mem_pos, train)
            intermediates.append(tgt)

        final_norm = nn.LayerNorm(name="final_norm")
        point_head = MLP(out_dim=3, num_layers=3, layer_width=16, out_activation=jnp.tanh,
                         name="point_head")
        ep_head = MLP(out_dim=1, num_layers=3, layer_width=16, out_activation=jax.nn.sigmoid,
                      name="existence_probability_head")
        unc_head = MLP(out_dim=3, num_layers=3, layer_width=16, out_activation=jax.nn.softplus,
                       name="radar_uncertainty_head")
        angle_head = MLP(out_dim=2, num_layers=3, layer_width=16, out_activation=jnp.tanh,
                         name="radar_angle_head")

        def predict(t):
            t = final_norm(t).astype(jnp.float32)  # small heads in f32
            xyz = self.position_scale * point_head(t)
            out = jnp.concatenate([ep_head(t), xyz, unc_head(t)], axis=-1).astype(jnp.float32)
            return out, angle_head(t)

        radar_output, angles = predict(intermediates[-1])
        if self.aux_loss and len(intermediates) > 1:
            aux = jnp.stack([predict(t)[0] for t in intermediates[:-1]])
            return radar_output, angles, aux
        return radar_output, angles


def spherical_to_cartesian(depth: jax.Array, elevation: jax.Array, azimuth: jax.Array) -> jax.Array:
    """Radar-frame spherical -> cartesian (cf. _get_cartesian_coords,
    models/neuradar.py:1025-1029)."""
    x = depth * jnp.cos(azimuth) * jnp.cos(elevation)
    y = depth * jnp.sin(azimuth) * jnp.cos(elevation)
    z = depth * jnp.sin(elevation)
    return jnp.concatenate([x, y, z], axis=-1)
