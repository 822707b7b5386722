"""Sequence-parallel ring attention over a ('data', 'seq') device mesh.

The reference bounds sequence length by truncation and has no long-context
machinery (SURVEY §2.2: `max_len` 600-2048, no ring/blockwise/Ulysses
anywhere). This module is the TPU-native stretch capability SURVEY §7 calls
out: shard the sequence axis across devices and stream K/V blocks around the
ICI ring with ``jax.lax.ppermute``, accumulating an online softmax — each
chip holds L/s of the tokens and the full [L, L] attention matrix is never
materialized on any one chip (memory per chip drops s×; bandwidth rides the
ring).

Semantics match :func:`..ops.attention.multi_head_attention` for unpacked
rows (key-padding mask; optional attention-probability dropout with
torch ``MultiheadAttention(dropout=p)`` scaling). As with the Pallas flash
kernel, the dropout *Bernoulli stream* differs from the XLA path's
``jax.random`` stream — dropout semantics, not stream identity, are the
contract (models/transformer.py:58-63). Packed segment masks are not
supported: packing already shortens rows, ring attention targets the long
unpacked regime.

Layout contract: the sequence axis of q/k/v/mask is sharded over ``seq``,
the batch axis over ``data``. L must divide evenly by the 'seq' axis size
(the tokenizer's static buckets are powers of two, so this always holds for
power-of-two meshes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30  # large-finite mask value: exp(_NEG - _NEG) stays defined


def _ring_body(q, k, v, key_mask, rng, *, axis_name: str, p_drop: float):
    """Per-shard ring attention (runs inside shard_map).

    q:        [B, Lq, H, D] this shard's query block
    k, v:     [B, Ls, H, D] this shard's resident key/value block
    key_mask: [B, Ls] bool, True = attend
    rng:      [2] uint32 key data (ignored when p_drop == 0)

    Returns [B, Lq, H, D]. K/V/mask rotate ``axis_size`` hops around the
    ring; each hop folds one block into the running (o, m, l) online-softmax
    state in float32.
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    b, lq, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    qf = q.astype(jnp.float32)

    o = jnp.zeros((b, h, lq, d), jnp.float32)
    m = jnp.full((b, h, lq), _NEG, jnp.float32)
    l = jnp.zeros((b, h, lq), jnp.float32)
    # ring direction: after step t this shard holds the block that started
    # on shard (me + t + 1) % n — k_idx identifies it for the dropout hash
    perm = [(i, (i - 1) % n) for i in range(n)]

    def step(carry, t):
        k_blk, v_blk, m_blk, o, m, l = carry
        logits = jnp.einsum("blhd,bshd->bhls", qf, k_blk.astype(jnp.float32))
        logits = logits * scale
        allow = m_blk[:, None, None, :]
        logits = jnp.where(allow, logits, _NEG)
        new_m = jnp.maximum(m, logits.max(-1))
        # exp of masked lanes is forced to exact zero (exp(_NEG-new_m) can be
        # exp(0)=1 when a query row is fully masked so far)
        p = jnp.where(allow, jnp.exp(logits - new_m[..., None]), 0.0)
        corr = jnp.exp(m - new_m)
        l = l * corr + p.sum(-1)
        if p_drop > 0.0:
            # per-(q-shard, k-block) substream so every device regenerates
            # the identical mask for a given block pair
            k_idx = (me + t + 1) % n
            sub = jax.random.fold_in(jax.random.wrap_key_data(rng),
                                     me * n + k_idx)
            from .attention import dropout_keep_mask
            keep, p_eff = dropout_keep_mask(sub, p.shape, p_drop)
            # dropout applies to normalized probs: drop the numerator
            # contribution only, l keeps the undropped mass
            p_o = jnp.where(keep, p / (1.0 - p_eff), 0.0)
        else:
            p_o = p
        o = o * corr[..., None] + jnp.einsum(
            "bhls,bshd->bhld", p_o, v_blk.astype(jnp.float32))
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        m_blk = jax.lax.ppermute(m_blk, axis_name, perm)
        return (k_blk, v_blk, m_blk, o, new_m, l), None

    (k, v, key_mask, o, m, l), _ = jax.lax.scan(
        step, (k, v, key_mask, o, m, l), jnp.arange(n))
    out = jnp.where(l[..., None] > 0, o / jnp.maximum(l, 1e-30)[..., None], 0.0)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,            # [B, L, H, D]
    k: jnp.ndarray,            # [B, L, H, D]
    v: jnp.ndarray,            # [B, L, H, D]
    key_mask: jnp.ndarray,     # [B, L] bool
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """Sequence-parallel attention: shard L over ``seq_axis`` and ring the
    K/V blocks. Drop-in for ``multi_head_attention`` on unpacked rows.

    shard_map is *partial-manual*: only ``seq_axis`` is manual, every other
    mesh axis (data, model, ...) stays under GSPMD control — the batch dim
    keeps whatever DP sharding the trainer gave it, with no divisibility
    constraint at this boundary."""
    s = mesh.shape[seq_axis]
    if q.shape[1] % s:
        raise ValueError(f"L={q.shape[1]} not divisible by seq axis size {s}")
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 requires dropout_rng")
    if dropout_rng is None:
        rng_data = jnp.zeros((2,), jnp.uint32)
    elif jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
        rng_data = jax.random.key_data(dropout_rng).astype(jnp.uint32)
    else:  # legacy raw uint32 key (what flax's make_rng hands out)
        rng_data = dropout_rng.astype(jnp.uint32)

    spec = P(None, seq_axis, None, None)
    mspec = P(None, seq_axis)
    fn = jax.shard_map(
        partial(_ring_body, axis_name=seq_axis, p_drop=float(dropout_rate)),
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec, P()),
        out_specs=spec,
        axis_names={seq_axis},
        check_vma=False,
    )
    return fn(q, k, v, key_mask, rng_data)
