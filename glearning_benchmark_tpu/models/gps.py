"""GPS: hybrid local-MPNN + global-attention graph transformer.

GraphGym-free reproduction of the GPS layer the reference drives through
GraphGPS registration (trainer/train_ggps.py:24,407; architecture documented
in reference docs/models/ggps.md:58-200; config gt.layer_type
'GIN+Transformer', configs/gps_graph_token.yaml:38-62):

    h  = h + LocalGIN(h, A)          (residual, then BatchNorm)
    h  = h + GlobalAttn(h, mask)     (residual, then BatchNorm)
    h  = h + FFN(h)                  (residual, then BatchNorm)

Global attention is full self-attention over the node axis of each graph —
on dense padded batches this is exactly masked MHA, no per-graph unbatching
(the reference materializes per-graph dense tensors inside GraphGPS).
Pooling and post-MP head follow gnn.head='graph', layers_post_mp=1.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention
from ..ops.segment import masked_mean, masked_sum, masked_max
from .mpnn import GINLayer, MaskedBatchNorm


class GPSLayer(nn.Module):
    dim: int
    n_heads: int = 4
    dropout: float = 0.0
    attn_dropout: float = 0.1
    dtype: Any = jnp.float32
    num_edge_types: int = 0   # >0 switches the local block to GINE messages

    @nn.compact
    def __call__(self, h, adj, mask, deterministic: bool, etype=None):
        b, n, d = h.shape
        # local MPNN block (GIN, or GINE when edge types are provided)
        local = GINLayer(self.dim, self.dropout, self.dtype,
                         num_edge_types=self.num_edge_types,
                         name="local_gin")(
            h, adj, mask, deterministic, etype=etype)
        local = nn.Dropout(self.dropout, deterministic=deterministic)(local)
        h = h + local
        h = MaskedBatchNorm(name="bn_local")(h, mask, use_running_average=deterministic)

        # global attention block
        hd = d // self.n_heads
        q = nn.Dense(d, name="q", dtype=self.dtype)(h).reshape(b, n, self.n_heads, hd)
        k = nn.Dense(d, name="k", dtype=self.dtype)(h).reshape(b, n, self.n_heads, hd)
        v = nn.Dense(d, name="v", dtype=self.dtype)(h).reshape(b, n, self.n_heads, hd)
        # attn_dropout acts on the attention PROBABILITIES (GraphGPS passes
        # it into torch MultiheadAttention); the residual-path dropout uses
        # the general rate
        p_attn = self.attn_dropout if not deterministic else 0.0
        attn = multi_head_attention(
            q, k, v, key_mask=mask, dropout_rate=p_attn,
            dropout_rng=self.make_rng("dropout") if p_attn > 0 else None,
        ).reshape(b, n, d)
        attn = nn.Dense(d, name="attn_out", dtype=self.dtype)(attn).astype(jnp.float32)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        h = h + attn
        h = MaskedBatchNorm(name="bn_attn")(h, mask, use_running_average=deterministic)

        # feed-forward block (GraphGPS uses 2x expansion)
        y = nn.Dense(2 * d, name="ff1")(h)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(d, name="ff2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        h = h + y
        h = MaskedBatchNorm(name="bn_ff")(h, mask, use_running_average=deterministic)
        return h


class GPSModel(nn.Module):
    in_dim: int = 1
    dim: int = 32
    num_layers: int = 4
    n_heads: int = 4
    dropout: float = 0.0
    attn_dropout: float = 0.1
    pooling: str = "mean"
    num_classes: int = 2
    task: str = "cycle_check"
    compute_dtype: str = "float32"
    edge_features: bool = False   # GINE local messages (model.edge_features)
    num_edge_types: int = 4       # ZINC bond types

    @nn.compact
    def __call__(self, node_feat, adj, mask, deterministic: bool = True,
                 etype=None):
        cdtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        use_e = self.edge_features and etype is not None
        h = nn.Dense(self.dim, name="node_encoder")(node_feat)
        for i in range(self.num_layers):
            h = GPSLayer(self.dim, self.n_heads, self.dropout, self.attn_dropout,
                         cdtype,
                         num_edge_types=self.num_edge_types if use_e else 0,
                         name=f"gps_{i}")(h, adj, mask, deterministic,
                                          etype=etype if use_e else None)
        h = h * mask[..., None].astype(h.dtype)
        if self.pooling == "mean":
            g = masked_mean(h, mask)
        elif self.pooling == "add":
            g = masked_sum(h, mask)
        else:
            g = masked_max(h, mask)
        out = nn.Dense(1 if self.task == "zinc" else self.num_classes,
                       name="post_mp")(g)
        if self.task == "zinc":
            return out.squeeze(-1)
        return out
