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

import jax.numpy as jnp
from jax import nn as jnn


def multi_head_attention(
    q: jnp.ndarray,            # [B, L, H, D]
    k: jnp.ndarray,            # [B, S, H, D]
    v: jnp.ndarray,            # [B, S, H, D]
    key_mask: Optional[jnp.ndarray] = None,  # [B, S] True = attend
) -> jnp.ndarray:
    """Scaled dot-product attention with key-padding mask. Returns [B, L, H, D]."""
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=q.dtype))
    logits = jnp.einsum("blhd,bshd->bhls", q, k) * scale
    if key_mask is not None:
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(key_mask[:, None, None, :], logits, neg)
    probs = jnn.softmax(logits, axis=-1)
    if key_mask is not None:
        # rows attending to nothing (fully padded) produce uniform softmax over
        # -inf; zero them out so padded queries emit exact zeros
        probs = jnp.where(key_mask[:, None, None, :], probs, 0.0)
    return jnp.einsum("bhls,bshd->blhd", probs, v)
