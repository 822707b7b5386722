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


def dropout_keep_mask(rng, shape, rate: float):
    """Attention-dropout keep mask with an 8-bit quantized rate.

    ``jax.random.bernoulli`` burns one full threefry2x32 draw (~7 rounds of
    u32 ALU work) per element and then compares in f32 — on the [B, H, L, L]
    attention-probability tensor that mask generation alone costs as much
    as the whole fwd+bwd attention math at benchmark head dims
    (FLASH_AB.json: xla fwdbwd 3.5 ms -> 7.1 ms with dropout at the ibtt
    shape). Here one u32 threefry word is unpacked into FOUR mask bytes, so
    the generator runs at a quarter of the elements, and the comparison is
    u8 (VPU-cheap).

    The drop rate quantizes to ``round(rate * 256) / 256`` (e.g. 0.1 ->
    26/256 = 0.1016); the returned ``effective_rate`` MUST be used for the
    1/(1-p) rescale so the expectation stays exactly unbiased. A 1/256
    rate granularity changes nothing statistically meaningful about
    dropout regularization; the reference's torch RNG stream was never a
    conformance surface (dropout bits differ across frameworks by nature).

    Layout: the four bytes of word ``w`` cover BLOCKED positions
    ``(w, w + S/4, w + 2S/4, w + 3S/4)`` of the last axis, via a lane-dim
    ``concatenate`` of the four shifted compares. Any fixed byte->position
    bijection yields i.i.d. uniform bytes; the obvious interleaved layout
    (``stack(..., axis=-1).reshape``) puts a size-4 axis on the TPU lane
    dimension, which tiles (8, 128) and pads 4 -> 128 lanes — a measured
    32x memory expansion (16 GB for one [128,4,1024,1024] mask) that
    regressed attention 3x instead of speeding it up.

    Returns ``(keep_mask bool[shape], effective_rate float)``.
    """
    thresh = int(round(rate * 256.0))
    if thresh <= 0:
        return jnp.ones(shape, bool), 0.0
    s_last = shape[-1]
    sq = (s_last + 3) // 4
    words = jax.random.bits(rng, shape[:-1] + (sq,), jnp.uint32)
    keep = jnp.concatenate(
        [((words >> s).astype(jnp.uint8) >= jnp.uint8(thresh))
         for s in (0, 8, 16, 24)], axis=-1)
    return keep[..., :s_last], thresh / 256.0


def cheap_dropout(rng, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout on activations via :func:`dropout_keep_mask`.

    Drop-in replacement for ``flax.linen.Dropout`` at the residual/FFN
    sites. Motivation is identical to the attention-prob case above:
    ``jax.random.bernoulli`` burns a full threefry draw per element, and
    at production widths the three per-layer [B, L, d]/[B, L, d_ff]
    dropout tensors dominate the MFU gap (MFU_ATTRIB_2048.json: base
    43.8% vs 56.0% with the residual/FFN dropout removed — the
    attention-prob dropout was already on the cheap mask and cost ~0).
    The blocked-byte mask generates at a quarter of the elements and
    compares in u8.

    Semantics: same Bernoulli(1-p') marginal per element with p'
    quantized to round(p*256)/256 and the exact 1/(1-p') rescale —
    unbiased, like the attention path. The Bernoulli STREAM differs from
    flax's (documented contract: dropout semantics, not stream identity,
    are what the framework pins — see EncoderLayer's docstring and the
    flash/ring kernels which already draw their own streams).
    """
    keep, p_eff = dropout_keep_mask(rng, x.shape, rate)
    if p_eff == 0.0:
        return x
    return jnp.where(keep, x / (1.0 - p_eff), jnp.zeros((), x.dtype))


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
        keep, p_eff = dropout_keep_mask(dropout_rng, probs.shape, dropout_rate)
        probs = jnp.where(keep, probs / (1.0 - p_eff), 0.0)
    return jnp.einsum("bhls,bshd->blhd", probs, v)
