"""Pallas TPU flash attention (non-causal, key-padding mask) with custom VJP.

Replaces the cuDNN attention under the reference's ``nn.TransformerEncoder``
(reference: trainer/train_ibtt.py:45-52). Neither pass materializes the
[L, S] attention matrix in HBM: the forward streams K/V grid-blocks through
an online-softmax accumulator held in VMEM scratch; the backward recomputes
probabilities blockwise (dQ streamed over KV blocks, dK/dV streamed over Q
blocks). At d_model 16-64 the materialized matrices are the dominant HBM
traffic, so this is the speed-of-light path for these transformers.

Layout: batch*heads are processed Z=8 rows per grid program (satisfying the
TPU (8, 128) tile constraint for the per-row statistics and batching the
small per-head matmuls); D pads to the 128 lane width; the streamed axis is
the last grid dimension (sequential on TPU), with carries in scratch and
outputs written on the final step — VMEM holds only one block of each
operand at a time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30
Z = 8  # batch*head rows per grid program


def _bdot(a, b, contract_a, contract_b):
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward: grid (BH/Z, L/bl, S/bs); carries in scratch, write at last s
# ---------------------------------------------------------------------------

def _attn_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                 acc_scr, m_scr, l_scr, *, scale: float):
    s_idx = pl.program_id(2)
    num_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)

    q = q_ref[...]                       # [Z, BL, D]
    k = k_ref[...]                       # [Z, BS, D]
    v = v_ref[...]
    kmask = mask_ref[...]                # [Z, BS] int8
    logits = _bdot(q, k, 2, 2) * scale   # [Z, BL, BS]
    logits = jnp.where(kmask[:, None, :] != 0, logits, NEG_INF)
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, logits.max(axis=-1, keepdims=True))
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[...] = alpha * l_scr[...] + p.sum(axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + _bdot(p, v.astype(jnp.float32), 2, 1)
    m_scr[...] = m_new

    @pl.when(s_idx == num_s - 1)
    def _finish():
        l_i = l_scr[...]
        safe_l = jnp.where(l_i > 0, l_i, 1.0)
        o_ref[...] = (acc_scr[...] / safe_l).astype(o_ref.dtype)
        lse_ref[...] = (m_scr[...] + jnp.log(safe_l))[:, :, 0]


# ---------------------------------------------------------------------------
# backward dQ: grid (BH/Z, L/bl, S/bs); dq carry in scratch
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, lse_ref, do_ref, delta_ref,
                   dq_ref, dq_scr, *, scale: float):
    s_idx = pl.program_id(2)
    num_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[...]
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...][:, :, None]
    delta = delta_ref[...][:, :, None]
    k = k_ref[...]
    v = v_ref[...]
    kmask = mask_ref[...]
    logits = _bdot(q, k, 2, 2) * scale
    logits = jnp.where(kmask[:, None, :] != 0, logits, NEG_INF)
    p = jnp.exp(logits - lse)
    dp = _bdot(do, v.astype(jnp.float32), 2, 2)
    ds = p * (dp - delta)
    dq_scr[...] = dq_scr[...] + _bdot(ds, k.astype(jnp.float32), 2, 1)

    @pl.when(s_idx == num_s - 1)
    def _finish():
        dq_ref[...] = (dq_scr[...] * scale).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward dK/dV: grid (BH/Z, S/bs, L/bl); dk/dv carries in scratch
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, lse_ref, do_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float):
    l_idx = pl.program_id(2)
    num_l = pl.num_programs(2)

    @pl.when(l_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[...]                       # [Z, BS, D]
    v = v_ref[...]
    kmask = mask_ref[...]                # [Z, BS]
    q = q_ref[...]                       # [Z, BL, D]
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...][:, :, None]
    delta = delta_ref[...][:, :, None]
    logits = _bdot(q, k, 2, 2) * scale   # [Z, BL, BS]
    logits = jnp.where(kmask[:, None, :] != 0, logits, NEG_INF)
    p = jnp.exp(logits - lse)
    dv_scr[...] = dv_scr[...] + _bdot(p, do, 1, 1)          # contract BL
    dp = _bdot(do, v.astype(jnp.float32), 2, 2)             # [Z, BL, BS]
    ds = p * (dp - delta)
    dk_scr[...] = dk_scr[...] + _bdot(ds, q.astype(jnp.float32), 1, 1)

    @pl.when(l_idx == num_l - 1)
    def _finish():
        dk_ref[...] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# folding / wrappers
# ---------------------------------------------------------------------------

def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _scratch(*shapes_dtypes):
    if pltpu is not None:
        return [pltpu.VMEM(s, d) for s, d in shapes_dtypes]
    # interpret mode on CPU: pltpu may be unavailable; use pl.ANY-style
    return [pltpu.VMEM(s, d) for s, d in shapes_dtypes]


def _fold_all(q, k, v, key_mask, block_l, block_s):
    b, l, h, d = q.shape
    bl = min(block_l, 512)
    bs = min(block_s, 512)
    blk = max(bl, bs)
    l_pad = -(-l // blk) * blk
    # D stays UNPADDED in HBM: a [*, block, D] window of a [BH, L, D] array
    # is contiguous, so the DMA moves only real bytes; lane padding to 128
    # happens in VMEM tiles only. (r1 padded D to 128 in HBM, which streamed
    # 8-32x phantom K/V bytes at this benchmark's head dims 4-16 and made
    # the kernel lose to XLA.) Sublane-align D to 8 for clean f32 tiling.
    d_pad = -(-d // 8) * 8
    bh = b * h
    bh_pad = -(-bh // Z) * Z

    def fold(x):
        x = _pad_to(_pad_to(x, l_pad, 1), d_pad, 3)
        x = x.transpose(0, 2, 1, 3).reshape(bh, l_pad, d_pad)
        return _pad_to(x, bh_pad, 0)

    maskf = jnp.repeat(_pad_to(key_mask, l_pad, 1), h, axis=0).astype(jnp.int8)
    maskf = _pad_to(maskf, bh_pad, 0)
    return fold(q), fold(k), fold(v), maskf, (b, l, h, d, l_pad, d_pad, bl, bs, bh, bh_pad)


def _unfold(out, dims):
    b, l, h, d, l_pad, d_pad, _, _, bh, _ = dims
    return out[:bh].reshape(b, h, l_pad, d_pad).transpose(0, 2, 1, 3)[:, :l, :, :d]


def _fwd_kernels(qf, kf, vf, maskf, dims, scale, interpret):
    b, l, h, d, l_pad, d_pad, bl, bs, bh, bh_pad = dims
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), qf.dtype),
                   jax.ShapeDtypeStruct((bh_pad, l_pad), jnp.float32)),
        grid=(bh_pad // Z, l_pad // bl, l_pad // bs),
        in_specs=[
            pl.BlockSpec((Z, bs), lambda i, j, s: (i, s)),
            pl.BlockSpec((Z, bl, d_pad), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((Z, bs, d_pad), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((Z, bs, d_pad), lambda i, j, s: (i, s, 0)),
        ],
        out_specs=(pl.BlockSpec((Z, bl, d_pad), lambda i, j, s: (i, j, 0)),
                   pl.BlockSpec((Z, bl), lambda i, j, s: (i, j))),
        scratch_shapes=_scratch(((Z, bl, d_pad), jnp.float32),
                                ((Z, bl, 1), jnp.float32),
                                ((Z, bl, 1), jnp.float32)),
        interpret=interpret,
    )(maskf, qf, kf, vf)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, key_mask, block_l, block_s, interpret):
    out, _ = _flash_fwd(q, k, v, key_mask, block_l, block_s, interpret)
    return out


def _flash_fwd(q, k, v, key_mask, block_l, block_s, interpret):
    qf, kf, vf, maskf, dims = _fold_all(q, k, v, key_mask, block_l, block_s)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    out, lse = _fwd_kernels(qf, kf, vf, maskf, dims, scale, interpret)
    return _unfold(out, dims), (qf, kf, vf, maskf, out, lse, dims, scale,
                                key_mask.shape)


def _flash_bwd(block_l, block_s, interpret, res, g):
    qf, kf, vf, maskf, of, lse, dims, scale, mask_shape = res
    b, l, h, d, l_pad, d_pad, bl, bs, bh, bh_pad = dims
    gf = _pad_to(_pad_to(g, l_pad, 1), d_pad, 3) \
        .transpose(0, 2, 1, 3).reshape(bh, l_pad, d_pad)
    gf = _pad_to(gf, bh_pad, 0)
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), qf.dtype),
        grid=(bh_pad // Z, l_pad // bl, l_pad // bs),
        in_specs=[
            pl.BlockSpec((Z, bs), lambda i, j, s: (i, s)),
            pl.BlockSpec((Z, bl, d_pad), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((Z, bs, d_pad), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((Z, bs, d_pad), lambda i, j, s: (i, s, 0)),
            pl.BlockSpec((Z, bl), lambda i, j, s: (i, j)),
            pl.BlockSpec((Z, bl, d_pad), lambda i, j, s: (i, j, 0)),
            pl.BlockSpec((Z, bl), lambda i, j, s: (i, j)),
        ],
        out_specs=pl.BlockSpec((Z, bl, d_pad), lambda i, j, s: (i, j, 0)),
        scratch_shapes=_scratch(((Z, bl, d_pad), jnp.float32)),
        interpret=interpret,
    )(maskf, qf, kf, vf, lse, gf, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), kf.dtype),
                   jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), vf.dtype)),
        grid=(bh_pad // Z, l_pad // bs, l_pad // bl),
        in_specs=[
            pl.BlockSpec((Z, bs), lambda i, s, j: (i, s)),
            pl.BlockSpec((Z, bl, d_pad), lambda i, s, j: (i, j, 0)),
            pl.BlockSpec((Z, bs, d_pad), lambda i, s, j: (i, s, 0)),
            pl.BlockSpec((Z, bs, d_pad), lambda i, s, j: (i, s, 0)),
            pl.BlockSpec((Z, bl), lambda i, s, j: (i, j)),
            pl.BlockSpec((Z, bl, d_pad), lambda i, s, j: (i, j, 0)),
            pl.BlockSpec((Z, bl), lambda i, s, j: (i, j)),
        ],
        out_specs=(pl.BlockSpec((Z, bs, d_pad), lambda i, s, j: (i, s, 0)),
                   pl.BlockSpec((Z, bs, d_pad), lambda i, s, j: (i, s, 0))),
        scratch_shapes=_scratch(((Z, bs, d_pad), jnp.float32),
                                ((Z, bs, d_pad), jnp.float32)),
        interpret=interpret,
    )(maskf, qf, kf, vf, lse, gf, delta)

    import numpy as _np
    zero_mask = _np.zeros(mask_shape, dtype=jax.dtypes.float0)
    return (_unfold(dq, dims), _unfold(dk, dims), _unfold(dv, dims), zero_mask)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_l", "block_s", "interpret"))
def flash_attention(q, k, v, key_mask, block_l: int = 128, block_s: int = 128,
                    interpret: bool = False):
    """Differentiable flash attention. q,k,v: [B, L, H, D]; key_mask: [B, L]
    True=attend. Returns [B, L, H, D]. Forward matches
    ops.attention.multi_head_attention on valid rows; gradients match XLA
    autodiff (tested to ~5e-7 in interpret mode)."""
    return _flash_core(q, k, v, key_mask, block_l, block_s, interpret)
