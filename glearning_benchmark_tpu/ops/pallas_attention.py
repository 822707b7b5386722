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


def _attn_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                 block_s: int, seq_s: int, scale: float):
    """One (batch*head, q-block) program: stream K/V blocks with an online
    softmax accumulator. Also emits the per-row logsumexp (for the VJP)."""
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
    lse_ref[0] = (m_i + jnp.log(safe_l))[:, 0]


def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, lse_ref, do_ref, delta_ref,
                   dq_ref, *, block_s: int, seq_s: int, scale: float):
    """dQ for one (batch*head, q-block): stream K/V, recompute P blockwise.
    dS = P ∘ (dO Vᵀ - Δ);  dQ = scale · dS K."""
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, None]
    delta = delta_ref[0][:, None]
    bl, d = q.shape
    acc = jnp.zeros((bl, d), dtype=jnp.float32)
    num_s = seq_s // block_s

    def body(s_idx, acc):
        k = k_ref[0, pl.ds(s_idx * block_s, block_s), :]
        v = v_ref[0, pl.ds(s_idx * block_s, block_s), :]
        kmask = mask_ref[0, pl.ds(s_idx * block_s, block_s)]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kmask[None, :], logits, NEG_INF)
        p = jnp.exp(logits - lse)
        dp = jnp.dot(do, v.T.astype(jnp.float32), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        acc = acc + jnp.dot(ds, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, num_s, body, acc)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, lse_ref, do_ref, delta_ref,
                    dk_ref, dv_ref, *, block_l: int, seq_l: int, scale: float):
    """dK/dV for one (batch*head, kv-block): stream Q blocks.
    dV = Pᵀ dO;  dK = scale · dSᵀ Q."""
    k = k_ref[0]
    v = v_ref[0]
    bs, d = k.shape
    kmask = mask_ref[0][:, None]      # [BS, 1] mask of THIS kv block
    dk = jnp.zeros((bs, d), dtype=jnp.float32)
    dv = jnp.zeros((bs, d), dtype=jnp.float32)
    num_l = seq_l // block_l

    def body(l_idx, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(l_idx * block_l, block_l), :]
        do = do_ref[0, pl.ds(l_idx * block_l, block_l), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(l_idx * block_l, block_l)][:, None]
        delta = delta_ref[0, pl.ds(l_idx * block_l, block_l)][:, None]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        logits = jnp.where(kmask.T, logits, NEG_INF)
        p = jnp.exp(logits - lse)          # [BL, BS]
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T.astype(jnp.float32), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, num_l, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fold_all(q, k, v, key_mask, block_l, block_s):
    b, l, h, d = q.shape
    bl = min(block_l, 512)
    bs = min(block_s, 512)
    l_pad = -(-l // max(bl, bs)) * max(bl, bs)
    d_pad = max(-(-d // 128) * 128, 128)

    def fold(x):
        x = _pad_to(_pad_to(x, l_pad, 1), d_pad, 3)
        return x.transpose(0, 2, 1, 3).reshape(b * h, l_pad, d_pad)

    maskf = jnp.repeat(_pad_to(key_mask, l_pad, 1), h, axis=0)  # [B*H, Lp]
    return fold(q), fold(k), fold(v), maskf, (b, l, h, d, l_pad, d_pad, bl, bs)


def _unfold(out, dims):
    b, l, h, d, l_pad, d_pad, _, _ = dims
    return out.reshape(b, h, l_pad, d_pad).transpose(0, 2, 1, 3)[:, :l, :, :d]


def _fwd_kernels(qf, kf, vf, maskf, dims, scale, interpret):
    b, l, h, d, l_pad, d_pad, bl, bs = dims
    bh = qf.shape[0]
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, block_s=bs, seq_s=l_pad, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh, l_pad, d_pad), qf.dtype),
                   jax.ShapeDtypeStruct((bh, l_pad), jnp.float32)),
        grid=(bh, l_pad // bl),
        in_specs=[
            pl.BlockSpec((1, l_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, bl), lambda i, j: (i, j))),
        interpret=interpret,
    )(maskf, qf, kf, vf)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, key_mask, block_l, block_s, interpret):
    qf, kf, vf, maskf, dims = _fold_all(q, k, v, key_mask, block_l, block_s)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    out, _ = _fwd_kernels(qf, kf, vf, maskf, dims, scale, interpret)
    return _unfold(out, dims)


def _flash_fwd(q, k, v, key_mask, block_l, block_s, interpret):
    qf, kf, vf, maskf, dims = _fold_all(q, k, v, key_mask, block_l, block_s)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    out, lse = _fwd_kernels(qf, kf, vf, maskf, dims, scale, interpret)
    return _unfold(out, dims), (qf, kf, vf, maskf, out, lse, dims, scale,
                                key_mask.shape)


def _flash_bwd(block_l, block_s, interpret, res, g):
    qf, kf, vf, maskf, of, lse, dims, scale, mask_shape = res
    b, l, h, d, l_pad, d_pad, bl, bs = dims
    bh = qf.shape[0]
    gf = _pad_to(_pad_to(g, l_pad, 1), d_pad, 3) \
        .transpose(0, 2, 1, 3).reshape(bh, l_pad, d_pad)
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_s=bs, seq_s=l_pad, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, l_pad, d_pad), qf.dtype),
        grid=(bh, l_pad // bl),
        in_specs=[
            pl.BlockSpec((1, l_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bl), lambda i, j: (i, j)),
            pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bl), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, bl, d_pad), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(maskf, qf, kf, vf, lse, gf, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_l=bl, seq_l=l_pad, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh, l_pad, d_pad), kf.dtype),
                   jax.ShapeDtypeStruct((bh, l_pad, d_pad), vf.dtype)),
        grid=(bh, l_pad // bs),
        in_specs=[
            pl.BlockSpec((1, bs), lambda i, j: (i, j)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bs, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, l_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((1, l_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, l_pad), lambda i, j: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((1, bs, d_pad), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, bs, d_pad), lambda i, j: (i, j, 0))),
        interpret=interpret,
    )(maskf, qf, kf, vf, lse, gf, delta)

    import numpy as _np
    zero_mask = _np.zeros(mask_shape, dtype=jax.dtypes.float0)
    return (_unfold(dq, dims), _unfold(dk, dims), _unfold(dv, dims), zero_mask)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_l", "block_s", "interpret"))
def flash_attention(q, k, v, key_mask, block_l: int = 256, block_s: int = 256,
                    interpret: bool = False):
    """Differentiable flash attention. q,k,v: [B, L, H, D]; key_mask: [B, L]
    True=attend. Returns [B, L, H, D].

    Forward matches ops.attention.multi_head_attention on valid rows; the
    custom VJP recomputes attention probabilities blockwise so neither pass
    materializes the [L, S] matrix in HBM (the HBM-traffic bound that
    dominates these small-d models)."""
    return _flash_core(q, k, v, key_mask, block_l, block_s, interpret)
