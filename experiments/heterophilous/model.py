"""Heterophilous-datasets task model (reference
``benchmark-datasets/heterophilous-datasets/model.py:12-55``): pre-norm
residual blocks — input linear + GELU, then per layer:
norm -> SIRConv -> dropout -> GELU -> linear -> dropout -> (+residual);
output norm + linear. ``--use-amp`` maps to a bf16 compute policy (the TPU
analog of torch.amp autocast; no GradScaler needed — train.py:75-81,106)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

from sir_gcn_tpu.graph import GraphBatch
from sir_gcn_tpu.models import Linear, SIRConv, get_norm


def gelu_exact(x):
    # torch nn.GELU default is the exact erf form (reference
    # heterophilous-datasets/model.py:18), not the tanh approximation
    return jax.nn.gelu(x, approximate=False)


class SIRModel(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int = 1
    input_dropout: float = 0.0
    dropout: float = 0.0
    norm: str = "none"
    residual: bool = False
    feat_dropout: float = 0.0
    agg_type: str = "mean"
    use_bf16: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, feats, *,
                 deterministic: bool = True):
        act = gelu_exact
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.use_bf16:
            feats = feats.astype(jnp.bfloat16)

        x = Linear(self.hidden_dim, name="input_linear")(feats)
        x = nn.Dropout(self.input_dropout,
                       deterministic=deterministic)(x)
        x = act(x)

        for i in range(self.num_layers):
            resid = x
            h = get_norm(self.norm, True, self.hidden_dim)(
                graph, x, deterministic=deterministic)
            h = SIRConv(self.hidden_dim, self.hidden_dim, act,
                        self.feat_dropout, agg_type=self.agg_type,
                        name=f"conv_{i}")(
                graph, h, deterministic=deterministic)
            h = drop(h)
            h = act(h)
            h = Linear(self.hidden_dim, name=f"linear_{i}")(h)
            h = drop(h)
            x = h + resid if self.residual else h

        x = get_norm(self.norm, True, self.hidden_dim)(
            graph, x, deterministic=deterministic)
        out = Linear(self.output_dim, name="output_linear")(x)
        return out.astype(jnp.float32)
