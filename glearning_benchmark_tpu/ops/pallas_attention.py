"""Pallas TPU flash attention (non-causal) with custom VJP.

Replaces the cuDNN attention under the reference's ``nn.TransformerEncoder``
(reference: trainer/train_ibtt.py:45-52). Neither pass materializes the
[L, S] attention matrix in HBM: the forward streams K/V grid-blocks through
an online-softmax accumulator held in VMEM scratch; the backward recomputes
probabilities blockwise (dQ streamed over KV blocks, dK/dV streamed over Q
blocks). At d_model 16-64 the materialized matrices are the dominant HBM
traffic, so this is the speed-of-light path for these transformers.

Masking is segment-based: an int32 segment id per token (0 = padding), with
tokens attending only within their own segment. A plain key-padding mask is
the special case seg = mask.astype(int32); packed rows (multiple sequences
per row, tokenization/pack.py) pass their real segment ids and get the
block-diagonal mask for free — the [L, S] comparison happens on VMEM tiles
inside the kernel, never in HBM.

Attention-prob dropout runs inside the kernel: a counter-based hash RNG
(murmur-style finalizer over absolute (bh, row, col) indices + a seed)
regenerates the identical keep mask in forward and both backward kernels
without ever materializing it in HBM. ``dropout_keep_reference`` replicates
the stream bit-exactly in plain jnp so tests can compare against XLA
attention with the very same mask. The stream differs from the XLA path's
``jax.random.bernoulli`` (documented: dropout needs a Bernoulli(keep) mask,
not a particular stream).

Layout: batch*heads are processed Z=8 rows per grid program (satisfying the
TPU (8, 128) tile constraint for the per-row statistics and batching the
small per-head matmuls); D stays unpadded in HBM (lane padding to 128
happens in VMEM tiles only); the streamed axis is the last grid dimension
(sequential on TPU), with carries in scratch and outputs written on the
final step — VMEM holds only one block of each operand at a time.
"""

from __future__ import annotations

import functools
import math

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
# counter-based dropout hash (shared by fwd/bwd kernels and the test
# reference) — triple32-style avalanche finalizer over absolute indices
# ---------------------------------------------------------------------------

def _hash_u32(seed_u32, bh_idx, row_idx, col_idx):
    """uint32 hash of absolute (batch*head, row, col) position + seed.
    All inputs int32/uint32 arrays broadcastable to a common shape."""
    x = bh_idx.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    x = x ^ (row_idx.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
    x = x ^ (col_idx.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    x = x + seed_u32
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _keep_threshold(p_drop: float):
    return jnp.uint32(min(int(p_drop * 4294967296.0), 4294967295))


def dropout_keep_reference(seed, bh, n_rows, n_cols, p_drop: float):
    """[bh, n_rows, n_cols] bool keep mask, bit-identical to the in-kernel
    stream (indices are absolute, so padding never shifts them)."""
    seed_u32 = jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
    bh_i = jax.lax.broadcasted_iota(jnp.int32, (bh, n_rows, n_cols), 0)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (bh, n_rows, n_cols), 1)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (bh, n_rows, n_cols), 2)
    return _hash_u32(seed_u32, bh_i, r_i, c_i) >= _keep_threshold(p_drop)


def _block_keep(seed_ref, i, j, s, bl, bs, p_drop):
    """In-kernel [Z, bl, bs] keep mask for grid block (i, j, s)."""
    shape = (Z, bl, bs)
    bh_i = i * Z + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    r_i = j * bl + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    c_i = s * bs + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    seed_u32 = seed_ref[0, 0].astype(jnp.uint32)
    return _hash_u32(seed_u32, bh_i, r_i, c_i) >= _keep_threshold(p_drop)


def _allow(seg_q, seg_k):
    """[Z, BL, BS] block-diagonal mask from segment-id blocks.
    seg 0 = padding: pad keys are never attended; pad queries attend
    nothing and emit exact zeros."""
    return (seg_q[:, :, None] == seg_k[:, None, :]) & (seg_k[:, None, :] != 0)


# ---------------------------------------------------------------------------
# forward: grid (BH/Z, L/bl, S/bs); carries in scratch, write at last s
# ---------------------------------------------------------------------------

def _attn_kernel(seed_ref, segq_ref, segk_ref, q_ref, k_ref, v_ref,
                 o_ref, lse_ref, acc_scr, m_scr, l_scr,
                 *, scale: float, p_drop: float):
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
    allow = _allow(segq_ref[...], segk_ref[...])   # [Z, BL, BS]
    logits = _bdot(q, k, 2, 2) * scale   # [Z, BL, BS]
    logits = jnp.where(allow, logits, NEG_INF)
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, logits.max(axis=-1, keepdims=True))
    # explicit zero where masked: a fully-masked row has m_new = NEG_INF and
    # exp(logits - m_new) = 1, which would corrupt l for pad queries
    p = jnp.exp(logits - m_new) * allow.astype(jnp.float32)
    alpha = jnp.exp(m_prev - m_new)
    # l (the softmax normalizer) always accumulates the UNdropped p —
    # dropout applies to the normalized probabilities, and the keep mask
    # commutes with the per-row scalar division
    l_scr[...] = alpha * l_scr[...] + p.sum(axis=-1, keepdims=True)
    if p_drop > 0.0:
        i, j = pl.program_id(0), pl.program_id(1)
        keep = _block_keep(seed_ref, i, j, s_idx, q.shape[1], k.shape[1],
                           p_drop)
        p_acc = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0)
    else:
        p_acc = p
    acc_scr[...] = acc_scr[...] * alpha + _bdot(p_acc, v.astype(jnp.float32), 2, 1)
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

def _bwd_dq_kernel(seed_ref, segq_ref, segk_ref, q_ref, k_ref, v_ref,
                   lse_ref, do_ref, delta_ref, dq_ref, dq_scr,
                   *, scale: float, p_drop: float):
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
    allow = _allow(segq_ref[...], segk_ref[...])
    logits = _bdot(q, k, 2, 2) * scale
    logits = jnp.where(allow, logits, NEG_INF)
    p = jnp.exp(logits - lse) * allow.astype(jnp.float32)
    dp = _bdot(do, v.astype(jnp.float32), 2, 2)
    if p_drop > 0.0:
        i, j = pl.program_id(0), pl.program_id(1)
        keep = _block_keep(seed_ref, i, j, s_idx, q.shape[1], k.shape[1],
                           p_drop)
        # dS = P * (keep*dP/keep_p - delta): delta already equals
        # rowsum(dO*O) = rowsum((keep*dP/keep_p)*P), so only dp is rescaled
        dp = jnp.where(keep, dp * (1.0 / (1.0 - p_drop)), 0.0)
    ds = p * (dp - delta)
    dq_scr[...] = dq_scr[...] + _bdot(ds, k.astype(jnp.float32), 2, 1)

    @pl.when(s_idx == num_s - 1)
    def _finish():
        dq_ref[...] = (dq_scr[...] * scale).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward dK/dV: grid (BH/Z, S/bs, L/bl); dk/dv carries in scratch
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(seed_ref, segq_ref, segk_ref, q_ref, k_ref, v_ref,
                    lse_ref, do_ref, delta_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr, *, scale: float, p_drop: float):
    l_idx = pl.program_id(2)
    num_l = pl.num_programs(2)

    @pl.when(l_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    k = k_ref[...]                       # [Z, BS, D]
    v = v_ref[...]
    q = q_ref[...]                       # [Z, BL, D]
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...][:, :, None]
    delta = delta_ref[...][:, :, None]
    allow = _allow(segq_ref[...], segk_ref[...])   # [Z, BL, BS]
    logits = _bdot(q, k, 2, 2) * scale   # [Z, BL, BS]
    logits = jnp.where(allow, logits, NEG_INF)
    p = jnp.exp(logits - lse) * allow.astype(jnp.float32)
    dp = _bdot(do, v.astype(jnp.float32), 2, 2)             # [Z, BL, BS]
    if p_drop > 0.0:
        # grid here is (i, s, j): program_id(1) walks S, program_id(2)
        # walks L — the (i, j, s) hash indices must match the fwd kernel's
        i, s = pl.program_id(0), pl.program_id(1)
        keep = _block_keep(seed_ref, i, l_idx, s, q.shape[1], k.shape[1],
                           p_drop)
        keepf = jnp.where(keep, 1.0 / (1.0 - p_drop), 0.0)
        pd = p * keepf                   # dropped probabilities (dV path)
        dp = dp * keepf
    else:
        pd = p
    dv_scr[...] = dv_scr[...] + _bdot(pd, do, 1, 1)          # contract BL
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
    return [pltpu.VMEM(s, d) for s, d in shapes_dtypes]


def _seed_spec():
    return pl.BlockSpec((1, 1), lambda i, j, s: (0, 0),
                        memory_space=pltpu.SMEM)


def _fold_all(q, k, v, seg, block_l, block_s):
    b, l, h, d = q.shape
    bl = min(block_l, 512)
    bs = min(block_s, 512)
    # pad L so BOTH block sizes divide it — the grid floor-divides l_pad by
    # bl and bs, so a max()-padded L with non-divisible blocks (e.g. bl=96,
    # L=128) would silently drop tail blocks and return garbage rows
    blk = math.lcm(bl, bs)
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

    segf = jnp.repeat(_pad_to(seg, l_pad, 1), h, axis=0).astype(jnp.int32)
    segf = _pad_to(segf, bh_pad, 0)
    return fold(q), fold(k), fold(v), segf, (b, l, h, d, l_pad, d_pad, bl, bs, bh, bh_pad)


def _unfold(out, dims):
    b, l, h, d, l_pad, d_pad, _, _, bh, _ = dims
    return out[:bh].reshape(b, h, l_pad, d_pad).transpose(0, 2, 1, 3)[:, :l, :, :d]


def _fwd_kernels(qf, kf, vf, segf, seed, dims, scale, p_drop, interpret):
    b, l, h, d, l_pad, d_pad, bl, bs, bh, bh_pad = dims
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, p_drop=p_drop),
        out_shape=(jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), qf.dtype),
                   jax.ShapeDtypeStruct((bh_pad, l_pad), jnp.float32)),
        grid=(bh_pad // Z, l_pad // bl, l_pad // bs),
        in_specs=[
            _seed_spec(),
            pl.BlockSpec((Z, bl), lambda i, j, s: (i, j)),
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
    )(seed, segf, segf, qf, kf, vf)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_core(q, k, v, seg, seed, block_l, block_s, p_drop, interpret):
    out, _ = _flash_fwd(q, k, v, seg, seed, block_l, block_s, p_drop,
                        interpret)
    return out


def _flash_fwd(q, k, v, seg, seed, block_l, block_s, p_drop, interpret):
    qf, kf, vf, segf, dims = _fold_all(q, k, v, seg, block_l, block_s)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    out, lse = _fwd_kernels(qf, kf, vf, segf, seed, dims, scale, p_drop,
                            interpret)
    return _unfold(out, dims), (qf, kf, vf, segf, seed, out, lse, dims,
                                scale, seg.shape)


def _flash_bwd(block_l, block_s, p_drop, interpret, res, g):
    qf, kf, vf, segf, seed, of, lse, dims, scale, seg_shape = res
    b, l, h, d, l_pad, d_pad, bl, bs, bh, bh_pad = dims
    gf = _pad_to(_pad_to(g, l_pad, 1), d_pad, 3) \
        .transpose(0, 2, 1, 3).reshape(bh, l_pad, d_pad)
    gf = _pad_to(gf, bh_pad, 0)
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, p_drop=p_drop),
        out_shape=jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), qf.dtype),
        grid=(bh_pad // Z, l_pad // bl, l_pad // bs),
        in_specs=[
            _seed_spec(),
            pl.BlockSpec((Z, bl), lambda i, j, s: (i, j)),
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
    )(seed, segf, segf, qf, kf, vf, lse, gf, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, p_drop=p_drop),
        out_shape=(jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), kf.dtype),
                   jax.ShapeDtypeStruct((bh_pad, l_pad, d_pad), vf.dtype)),
        grid=(bh_pad // Z, l_pad // bs, l_pad // bl),
        in_specs=[
            _seed_spec(),
            pl.BlockSpec((Z, bl), lambda i, s, j: (i, j)),
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
    )(seed, segf, segf, qf, kf, vf, lse, gf, delta)

    import numpy as _np
    zero_seg = _np.zeros(seg_shape, dtype=jax.dtypes.float0)
    zero_seed = _np.zeros((1, 1), dtype=jax.dtypes.float0)
    return (_unfold(dq, dims), _unfold(dk, dims), _unfold(dv, dims),
            zero_seg, zero_seed)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_l", "block_s", "p_drop",
                                              "interpret"))
def flash_attention(q, k, v, key_mask=None, block_l: int = 128,
                    block_s: int = 128, interpret: bool = False, *,
                    seg=None, p_drop: float = 0.0, seed=None):
    """Differentiable flash attention. q,k,v: [B, L, H, D].

    Masking: pass ``key_mask`` [B, L] bool (True = attend) for ordinary
    rows, or ``seg`` [B, L] int32 segment ids (0 = pad) for packed rows —
    tokens attend only within their own segment. Padded/pad-segment query
    positions emit exact zeros.

    ``p_drop`` > 0 applies attention-prob dropout inside the kernel using a
    counter-based hash of (seed, absolute position); the identical mask is
    regenerated in the backward kernels. ``seed`` is any int32 scalar/array.

    Returns [B, L, H, D]. Forward matches ops.attention.multi_head_attention
    on valid rows; gradients match XLA autodiff (tested in interpret mode).
    """
    if seg is None:
        if key_mask is None:
            raise ValueError("flash_attention needs key_mask or seg")
        seg = key_mask.astype(jnp.int32)
    seed_arr = (jnp.zeros((1, 1), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return _flash_core(q, k, v, jnp.asarray(seg, jnp.int32), seed_arr,
                       block_l, block_s, float(p_drop), interpret)
