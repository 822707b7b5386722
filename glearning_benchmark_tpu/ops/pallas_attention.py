"""Pallas TPU flash-attention (non-causal, key-padding mask).

Replaces the cuDNN attention under the reference's ``nn.TransformerEncoder``
(reference: trainer/train_ibtt.py:45-52) with an on-chip streaming-softmax
kernel: Q tiles stay resident in VMEM while K/V tiles stream through, so the
[L, S] probability matrix never materializes in HBM. At this benchmark's
scale (L <= 2048, d_model 16-64) XLA's fused attention is already near
roofline, so :func:`flash_attention` is opt-in from ops.attention; it exists
for the longer-sequence regime (ZINC max_len 2048) and as the template for
future kernels.

Layout: heads are folded into the batch grid dimension; blocks are
(BLOCK_L, D) for Q/out and (BLOCK_S, D) for K/V with D padded to the lane
width (128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlib builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e30


def _attn_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, block_s: int, seq_s: int, scale: float):
    """One (batch*head, q-block) program: stream K/V blocks with an online
    softmax accumulator."""
    q = q_ref[0]                      # [BL, D]
    bl, d = q.shape
    acc = jnp.zeros((bl, d), dtype=jnp.float32)
    m_i = jnp.full((bl, 1), NEG_INF, dtype=jnp.float32)
    l_i = jnp.zeros((bl, 1), dtype=jnp.float32)

    num_s = seq_s // block_s

    def body(s_idx, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(s_idx * block_s, block_s), :]      # [BS, D]
        v = v_ref[0, pl.ds(s_idx * block_s, block_s), :]
        kmask = mask_ref[0, pl.ds(s_idx * block_s, block_s)]  # [BS]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kmask[None, :], logits, NEG_INF)
        m_new = jnp.maximum(m_i, logits.max(axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v.astype(jnp.float32),
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc, m_i, l_i = jax.lax.fori_loop(0, num_s, body, (acc, m_i, l_i))
    safe_l = jnp.where(l_i > 0, l_i, 1.0)
    o_ref[0] = (acc / safe_l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_l", "block_s", "interpret"))
def flash_attention(q, k, v, key_mask, block_l: int = 256, block_s: int = 256,
                    interpret: bool = False):
    """q,k,v: [B, L, H, D]; key_mask: [B, L] True=attend. Returns [B, L, H, D].

    Numerically equivalent to ops.attention.multi_head_attention (tested on
    CPU via interpret mode); padded query rows yield zeros.
    """
    b, l, h, d = q.shape
    bl = min(block_l, max(128, 1))
    bs = min(block_s, max(128, 1))
    l_pad = -(-l // bl) * bl
    d_pad = max(-(-d // 128) * 128, 128)

    def fold(x):
        x = _pad_to(_pad_to(x, l_pad, 1), d_pad, 3)
        return x.transpose(0, 2, 1, 3).reshape(b * h, l_pad, d_pad)

    qf, kf, vf = fold(q), fold(k), fold(v)
    maskf = jnp.repeat(_pad_to(key_mask, l_pad, 1), h, axis=0)  # [B*H, Lp]

    grid = (b * h, l_pad // bl)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_s=bs, seq_s=l_pad, scale=1.0 / (d ** 0.5)),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, l_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(maskf, qf, kf, vf)

    out = out.reshape(b, h, l_pad, d_pad).transpose(0, 2, 1, 3)
    return out[:, :l, :, :d]
