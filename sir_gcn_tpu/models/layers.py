"""Shared low-level layers: torch-initialization-compatible Linear/Embed.

The reference's training dynamics come from PyTorch's default initializers
(``nn.Linear``: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias;
``nn.Embedding``: N(0, 1)). We reproduce those scales so quality parity with
the published tables (BASELINE.md) does not drift from init choices.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Linear(nn.Module):
    """``nn.Linear`` with PyTorch default init (weight and bias both
    U(+-1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / jnp.sqrt(fan_in)

        def bias_init(key, shape, dtype=jnp.float32):
            import jax
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
        )(x)


class Embed(nn.Module):
    """``nn.Embedding`` with PyTorch default init N(0, 1) and optional
    ``padding_idx`` (row pinned to zero at init, as used by
    ``CentralityEncoder`` — reference ``models/utils.py:77``)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None

    @nn.compact
    def __call__(self, ids):
        def init(key, shape, dtype=jnp.float32):
            import jax
            emb = jax.random.normal(key, shape, dtype)
            if self.padding_idx is not None:
                emb = emb.at[self.padding_idx].set(0.0)
            return emb

        table = self.param(
            "embedding", init, (self.num_embeddings, self.features)
        )
        return jnp.take(table, ids, axis=0)
