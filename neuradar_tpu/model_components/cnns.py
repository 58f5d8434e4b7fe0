"""Convolutional blocks for the RGB upsampling decoder.

cf. reference nerfstudio/model_components/cnns.py (BasicBlock) and the
rgb_decoder assembly at models/neuradar.py:225-240. flax convs are NHWC,
the natural TPU layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    """Residual conv block: conv-bn-relu-conv-bn plus a (1x1) shortcut."""

    dim: int
    kernel_size: int = 7
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_dim = x.shape[-1]
        res = x if in_dim == self.dim else nn.Conv(self.dim, (1, 1), name="res_conv")(x)
        k = (self.kernel_size, self.kernel_size)
        h = nn.Conv(self.dim, k, padding="SAME", name="conv1")(x)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, k, padding="SAME", name="conv2")(h)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        return nn.relu(res + h)


class RGBDecoder(nn.Module):
    """Patch upsampling decoder: 1x1 conv -> 2 BasicBlocks(k7) ->
    ConvTranspose(x upsample) -> 2 BasicBlocks -> 1x1 conv -> sigmoid.

    cf. reference models/neuradar.py:225-240. Input [B, H, W, C] feature
    patches, output [B, H*u, W*u, 3] rgb.
    """

    hidden_dim: int = 32
    upsample_factor: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        u = self.upsample_factor
        h = nn.relu(nn.Conv(self.hidden_dim, (1, 1), name="conv_in")(x))
        h = BasicBlock(self.hidden_dim, 7, name="block1")(h, train)
        h = BasicBlock(self.hidden_dim, 7, name="block2")(h, train)
        h = nn.ConvTranspose(self.hidden_dim, (u, u), strides=(u, u), name="up")(h)
        h = BasicBlock(self.hidden_dim, 7, name="block3")(h, train)
        h = BasicBlock(self.hidden_dim, 7, name="block4")(h, train)
        h = nn.Conv(3, (1, 1), name="conv_out")(h)
        return jax.nn.sigmoid(h)
