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


def _hash1_u32(seed_u32, idx_u32):
    """triple32-style avalanche finalizer over a linear element index.

    Same hash family as the flash kernel's in-kernel counter RNG
    (:func:`.pallas_attention._hash_u32` — already a shipped, documented
    dropout stream), specialized to a single pre-linearized index. The
    finalizer is a bijection on u32, so distinct word indices map to
    distinct outputs (perfect equidistribution of the word stream).
    """
    x = idx_u32 * jnp.uint32(0x9E3779B1) + seed_u32
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def hash_keep_mask(seed_u32, shape, rate: float):
    """Counter-hash keep mask: blocked-byte layout, ~10 u32 ops per word.

    Drop-in alternative generator to :func:`dropout_keep_mask`'s threefry
    path. threefry2x32 burns ~7 rounds (~100 u32 ALU ops) per word; at
    production widths that generator work is the dominant residual dropout
    cost after the blocked-byte layout fix (DROPOUT_MICROBENCH.json). Here
    each u32 word is ``finalizer(linear_word_index + seed)`` — ~10 ALU ops,
    pure elementwise over an iota so XLA fuses it into the consuming
    select, and the backward can regenerate it for the cost of the iota
    + hash instead of loading stored words from HBM.

    Statistical contract: identical to the flash kernel's in-kernel
    dropout stream family (triple32 avalanche over absolute element
    indices; pallas_attention.py docstring) — a Bernoulli(1-p') marginal
    with p' = round(p*256)/256, independent across sites because each
    dropout site derives a distinct ``seed_u32`` from its own flax RNG
    key. Word indices are linearized over the whole tensor (u32 wrap
    beyond 2^32 words = 16G elements is fine at any realistic activation
    size). Returns ``(keep bool[shape], effective_rate)``.
    """
    thresh = int(round(rate * 256.0))
    if thresh <= 0:
        return jnp.ones(shape, bool), 0.0
    s_last = shape[-1]
    sq = (s_last + 3) // 4
    wshape = shape[:-1] + (sq,)
    nax = len(wshape)
    idx = jax.lax.broadcasted_iota(jnp.uint32, wshape, nax - 1)
    stride = sq
    for ax in range(nax - 2, -1, -1):
        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, wshape, ax) \
            * jnp.uint32(stride)
        stride *= wshape[ax]
    words = _hash1_u32(jnp.asarray(seed_u32, jnp.uint32), idx)
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

    r5: the word generator is :func:`hash_keep_mask` (counter-hash over
    the linear element index, seeded by one threefry word drawn from
    ``rng``) rather than threefry-per-word — measured 2x cheaper at the
    production FFN shape (DROPOUT_MICROBENCH.json: dropout cost 1.34 ->
    0.66 ms per block vs the no-dropout ceiling) because the hash is ~10
    ALU ops/word vs threefry's ~100 and XLA fuses the iota+hash into the
    consuming select.

    Semantics: same Bernoulli(1-p') marginal per element with p'
    quantized to round(p*256)/256 and the exact 1/(1-p') rescale —
    unbiased, like the attention path. The Bernoulli STREAM differs from
    flax's (documented contract: dropout semantics, not stream identity,
    are what the framework pins — see EncoderLayer's docstring and the
    flash/ring kernels which already draw their own streams).
    """
    if int(round(rate * 256.0)) <= 0:
        return x
    seed = jax.random.bits(rng, (), jnp.uint32)
    keep, p_eff = hash_keep_mask(seed, x.shape, rate)
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
    if dropout_rate > 0.0 and dropout_rng is not None \
            and int(round(dropout_rate * 256.0)) > 0:
        # counter-hash generator (see hash_keep_mask): measured 2x cheaper
        # mask generation than the threefry blocked-byte path at both the
        # benchmark head dims and production widths
        seed = jax.random.bits(dropout_rng, (), jnp.uint32)
        keep, p_eff = hash_keep_mask(seed, probs.shape, dropout_rate)
        probs = jnp.where(keep, probs / (1.0 - p_eff), 0.0)
    return jnp.einsum("bhls,bshd->blhd", probs, v)
