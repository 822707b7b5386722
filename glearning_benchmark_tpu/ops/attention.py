"""Masked multi-head attention.

Replaces ``nn.TransformerEncoder``'s cuDNN attention (reference:
trainer/train_ibtt.py:45-52) with an XLA dot-general implementation whose
einsums map straight onto the MXU. A Pallas flash-attention kernel
(:mod:`.pallas_attention`) is used on TPU when sequence lengths warrant it;
at the d16-d64 / L<=2048 scale of this benchmark XLA's fused attention is at
roofline, so the kernel is opt-in.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import nn as jnn


def multi_head_attention(
    q: jnp.ndarray,            # [B, L, H, D]
    k: jnp.ndarray,            # [B, S, H, D]
    v: jnp.ndarray,            # [B, S, H, D]
    key_mask: Optional[jnp.ndarray] = None,  # [B, S] True = attend
    seg: Optional[jnp.ndarray] = None,       # [B, L] packed segment ids (0 = pad)
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Scaled dot-product attention with key-padding mask. Returns [B, L, H, D].

    ``seg`` enables packed rows: tokens attend only within their own segment
    (block-diagonal mask, segment 0 = padding). The equality test fuses into
    the masking select — no [B, L, S] mask is materialized in HBM.

    ``dropout_rate``/``dropout_rng`` apply dropout to the attention
    probabilities (torch ``MultiheadAttention(dropout=p)`` semantics, which
    ``nn.TransformerEncoderLayer`` enables by default — train_ibtt.py:45-50).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=q.dtype))
    logits = jnp.einsum("blhd,bshd->bhls", q, k) * scale
    if seg is not None:
        allow = (seg[:, None, :, None] == seg[:, None, None, :]) \
            & (seg > 0)[:, None, None, :]
    elif key_mask is not None:
        allow = key_mask[:, None, None, :]
    else:
        allow = None
    if allow is not None:
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(allow, logits, neg)
    probs = jnn.softmax(logits, axis=-1)
    if allow is not None:
        # rows attending to nothing (fully padded) produce uniform softmax over
        # -inf; zero them out so padded queries emit exact zeros
        probs = jnp.where(allow, probs, 0.0)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhls,bshd->blhd", probs, v)
