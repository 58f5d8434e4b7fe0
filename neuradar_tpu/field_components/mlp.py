"""MLP blocks sized for the TPU MXU.

Replaces the reference's tiny-cuda-nn FullyFusedMLP/CutlassMLP
(nerfstudio/field_components/mlp.py:60-294). The widths used by NeuRAD(ar)
(16/32/64) are small dot chains that XLA fuses into a handful of MXU passes;
activations can run in bfloat16 with float32 params.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    """Multi-layer perceptron matching the reference ``MLP`` semantics:
    ``num_layers`` total linear layers, hidden width ``layer_width``,
    ``activation`` between layers and optional ``out_activation``.
    """

    out_dim: int
    num_layers: int = 2
    layer_width: int = 32
    activation: Callable = nn.relu
    out_activation: Optional[Callable] = None
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        dtype = self.compute_dtype or x.dtype
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.layer_width, dtype=dtype, name=f"hidden_{i}")(x)
            x = self.activation(x)
        x = nn.Dense(self.out_dim, dtype=dtype, name="output")(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x.astype(orig_dtype)
