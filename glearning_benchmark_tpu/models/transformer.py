"""SimpleTransformer: the shared IBTT/AGTT sequence model.

Functional re-design of the reference's PyTorch model (trainer/
train_ibtt.py:24-138 and the intentionally identical trainer/
train_agtt.py:35-147): learned token + absolute positional embeddings, a
post-LN encoder stack matching ``nn.TransformerEncoderLayer`` semantics
(self-attn -> add -> LN -> FFN(ReLU) -> add -> LN, key-padding mask),
trunc-normal(0.02) embedding/classifier init, <bos>-pooling with a masked-
mean fallback, and for shortest_path a *vectorized* query-node readout:
the reference scans each sample in a Python loop to find the '<q>' token
(train_ibtt.py:89-105 / train_agtt.py:101-113); here it is one
``argmax(x == q_id)`` + ``take_along_axis`` — fully inside jit.

Query offsets differ by serialization: IBTT queries read
'<q> shortest_distance u v' (u at +2, v at +3); AGTT trails read
'<q> u v' (u at +1, v at +2) — pass ``query_offsets`` accordingly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import cheap_dropout, multi_head_attention

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch ``TransformerEncoderLayer``
    default semantics: norm_first=False, ReLU activation).

    ``dtype`` is the compute dtype (bfloat16 on TPU halves the HBM traffic
    of the L² attention matrices, the measured bottleneck); parameters and
    LayerNorm statistics stay float32.
    """

    d_model: int
    nhead: int
    d_ff: int
    p_drop: float = 0.1
    use_flash: bool = False
    dtype: Any = jnp.float32
    sp_mesh: Any = None   # ('data','seq') Mesh -> sequence-parallel ring attn
    moe_experts: int = 0  # >0: Switch MoE FFN (models/moe.py, EP-shardable)
    moe_capacity: float = 1.25
    ep_mesh: Any = None   # ('data','expert') Mesh -> manual all-to-all MoE
    # measurement overrides (tools/mfu_bench.py --attrib): split the
    # attention-prob dropout rate from the residual/FFN nn.Dropout rate,
    # and optionally split the latter into its two [B,L,d] residual sites
    # (attn-out, ffn-out) vs the [B,L,d_ff] FFN-inner site.
    # None -> p_drop for all (the shipped behavior).
    attn_p_drop: Optional[float] = None
    mlp_p_drop: Optional[float] = None
    resid_p_drop: Optional[float] = None   # the two [B,L,d] sites
    ffn_p_drop: Optional[float] = None     # the [B,L,d_ff] inner site

    def _drop(self, x, rate: float, deterministic: bool):
        """Residual/FFN dropout via the quantized blocked-byte keep mask.

        Replaces ``nn.Dropout`` (threefry-bernoulli per element) at the
        three per-layer sites — at d2048 those masks alone cost ~12
        points of MFU (MFU_ATTRIB_2048.json: 43.8% -> 56.0% without
        them). Same Bernoulli marginal at the 1/256-quantized rate with
        the exact unbiased rescale; the bit stream differs from flax's
        (the framework's documented dropout contract — the flash/ring
        attention kernels already draw their own streams).
        """
        if deterministic or rate <= 0.0:
            return x
        return cheap_dropout(self.make_rng("dropout"), x, rate)

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_mask: jnp.ndarray, deterministic: bool,
                 seg: Optional[jnp.ndarray] = None):
        b, l, d = x.shape
        h = self.nhead
        hd = d // h
        p_attn = self.p_drop if self.attn_p_drop is None else self.attn_p_drop
        p_mlp = self.p_drop if self.mlp_p_drop is None else self.mlp_p_drop
        p_res = p_mlp if self.resid_p_drop is None else self.resid_p_drop
        p_ffn = p_mlp if self.ffn_p_drop is None else self.ffn_p_drop
        qkv = nn.Dense(3 * d, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, h, hd)
        k = k.reshape(b, l, h, hd)
        v = v.reshape(b, l, h, hd)
        # attention-prob dropout (torch MultiheadAttention default,
        # train_ibtt.py:45-50). All paths apply it; the flash kernel and the
        # ring path regenerate their keep masks from their own hashes (their
        # Bernoulli streams differ from the XLA path's jax.random — dropout
        # semantics, not stream identity, are the contract)
        attn_drop = p_attn if (not deterministic and p_attn > 0) else 0.0
        if self.sp_mesh is not None:
            if seg is not None:
                raise ValueError("sequence-parallel ring attention does not "
                                 "support packed rows (disable dataset.pack)")
            from ..ops.ring_attention import ring_attention
            attn = ring_attention(
                self.sp_mesh, q, k, v, key_mask,
                dropout_rate=attn_drop,
                dropout_rng=self.make_rng("dropout") if attn_drop else None)
        elif self.use_flash:
            import jax

            from ..ops.pallas_attention import flash_attention
            seed = (jax.random.randint(self.make_rng("dropout"), (1, 1), 0,
                                       jnp.iinfo(jnp.int32).max, jnp.int32)
                    if attn_drop else None)
            segi = seg if seg is not None else key_mask
            attn = flash_attention(q, k, v, seg=segi.astype(jnp.int32),
                                   p_drop=attn_drop, seed=seed)
        else:
            attn = multi_head_attention(
                q, k, v, key_mask=key_mask, seg=seg,
                dropout_rate=attn_drop,
                dropout_rng=self.make_rng("dropout") if attn_drop else None)
        attn = nn.Dense(d, name="out_proj", dtype=self.dtype)(attn.reshape(b, l, d))
        attn = self._drop(attn, p_res, deterministic)
        x = nn.LayerNorm(name="norm1")((x + attn).astype(jnp.float32))

        if self.moe_experts > 0:
            from .moe import SwitchFFN
            y = SwitchFFN(d, self.d_ff, self.moe_experts, self.moe_capacity,
                          self.p_drop, self.dtype, self.ep_mesh, name="moe")(
                x.astype(self.dtype), key_mask, deterministic)
        else:
            y = nn.Dense(self.d_ff, name="ff1", dtype=self.dtype)(x)
            y = nn.relu(y)
            y = self._drop(y, p_ffn, deterministic)
            y = nn.Dense(d, name="ff2", dtype=self.dtype)(y)
        y = self._drop(y, p_res, deterministic)
        return nn.LayerNorm(name="norm2")((x + y).astype(jnp.float32))


def transformer_embed(embed_fn, pos_fn, x, pos):
    """Token + positional embedding prefix (shared by ``__call__`` and the
    pipeline-parallel forward, parallel/pipeline.py — one definition so the
    two paths cannot drift)."""
    l = x.shape[1]
    h = embed_fn(x)
    pos_ids = jnp.arange(l)[None, :] if pos is None else pos
    return h + pos_fn(pos_ids)


def transformer_readout(norm, cls, h, x, attn_mask, *, d_model, task,
                        use_query_nodes, bos_id, query_offsets,
                        q_token_id=None, seg=None, pos_bos=None,
                        pos_u=None, pos_v=None):
    """Pooling + classifier readout after the encoder stack.

    ``norm``/``cls`` are callables (bound submodules inside ``__call__``,
    unbound ``.apply`` closures in the pipeline-parallel path). Unpacked
    rows (seg=None): <bos> pooling with masked-mean fallback
    (train_ibtt.py:114-120) and the vectorized '<q>' readout; packed rows:
    host-precomputed per-slot gathers. Identical semantics to the inline
    body this was extracted from."""
    if seg is not None:
        # packed readout: gather per-example slots [B, K] -> [B, K, d]
        def take(idx):
            return jnp.take_along_axis(
                h, idx[:, :, None].repeat(d_model, -1), axis=1)

        bos_emb = take(pos_bos)
        if use_query_nodes:
            u_emb = take(pos_u)
            v_emb = take(pos_v)
            # slot 0 is always a segment's <bos>, so 0 means "no query"
            ok_u = (pos_u > 0)[..., None]
            ok_v = (pos_v > 0)[..., None]
            u_emb = jnp.where(ok_u, u_emb, jnp.zeros_like(u_emb))
            v_emb = jnp.where(ok_v, v_emb, jnp.zeros_like(v_emb))
            pooled = jnp.concatenate(
                [norm(bos_emb), norm(u_emb), norm(v_emb)], axis=-1)
        else:
            pooled = norm(bos_emb)
        out = cls(pooled)
        if task == "zinc":
            return out.squeeze(-1)
        return out

    l = x.shape[1]
    # <bos> pooling with masked-mean fallback (train_ibtt.py:114-120)
    maskf = attn_mask.astype(h.dtype)
    lens = jnp.clip(maskf.sum(-1, keepdims=True), 1.0, None)
    mean_emb = (h * maskf[..., None]).sum(1) / lens
    all_bos = jnp.all(x[:, 0] == bos_id)
    bos_emb = jnp.where(all_bos, h[:, 0], mean_emb)

    if use_query_nodes and q_token_id is not None:
        # vectorized '<q>' search: first match per row
        is_q = (x == q_token_id) & attn_mask
        found = jnp.any(is_q, axis=1)
        q_pos = jnp.argmax(is_q, axis=1)
        off_u, off_v = query_offsets
        # bound against the example's TRUE length, not the padded row
        # width — a sequence truncated inside its query tail must zero
        # u/v exactly like the packed path does (tokenization/pack.py
        # checks q+off_v < m), or train (packed) and eval (unpacked)
        # would disagree on those examples
        row_len = attn_mask.sum(axis=1)
        in_range = found & (q_pos + off_v < row_len)
        iu = jnp.clip(q_pos + off_u, 0, l - 1)
        iv = jnp.clip(q_pos + off_v, 0, l - 1)
        u_emb = jnp.take_along_axis(h, iu[:, None, None].repeat(d_model, -1), axis=1)[:, 0]
        v_emb = jnp.take_along_axis(h, iv[:, None, None].repeat(d_model, -1), axis=1)[:, 0]
        zero = jnp.zeros_like(u_emb)
        u_emb = jnp.where(in_range[:, None], u_emb, zero)
        v_emb = jnp.where(in_range[:, None], v_emb, zero)
        pooled = jnp.concatenate([norm(bos_emb), norm(u_emb), norm(v_emb)], axis=-1)
    else:
        pooled = norm(bos_emb)

    out = cls(pooled)
    if task == "zinc":
        return out.squeeze(-1)
    return out


class SimpleTransformer(nn.Module):
    vocab_size: int
    d_model: int = 256
    nhead: int = 8
    nlayers: int = 4
    d_ff: int = 512
    p_drop: float = 0.1
    max_pos: int = 4096
    num_classes: int = 2
    use_query_nodes: bool = True
    task: str = "cycle_check"
    bos_id: int = 1                       # SPECIAL.index('<bos>') for IBTT; SOS=0 for AGTT
    query_offsets: Tuple[int, int] = (2, 3)
    remat: bool = False                   # rematerialize encoder layers (trade
                                          # FLOPs for HBM at long seq lengths)
    use_flash: bool = False               # Pallas flash attention (TPU only)
    compute_dtype: str = "float32"        # 'bfloat16' halves attention traffic
    sp_mesh: Any = None                   # ('data','seq') Mesh: shard L and
                                          # ring K/V blocks over ICI
                                          # (ops/ring_attention.py)
    moe_experts: int = 0                  # >0: Switch MoE FFN per layer
                                          # (models/moe.py; EP via
                                          # parallel.expert_shards)
    moe_capacity: float = 1.25
    ep_mesh: Any = None                   # ('data','expert') Mesh: manual
                                          # all-to-all MoE dispatch
                                          # (parallel.ep_manual)
    attn_p_drop: Optional[float] = None   # measurement overrides: split the
    mlp_p_drop: Optional[float] = None    # attention-prob vs residual/FFN
                                          # dropout rates (None -> p_drop)
    resid_p_drop: Optional[float] = None  # finer split of mlp_p_drop: the
    ffn_p_drop: Optional[float] = None    # two [B,L,d] residual sites vs
                                          # the [B,L,d_ff] FFN-inner site

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                    # [B, L] int32 token ids
        attn_mask: jnp.ndarray,            # [B, L] bool, True = valid
        q_token_id: Optional[int] = None,  # id of '<q>' for query readout
        deterministic: bool = True,
        seg: Optional[jnp.ndarray] = None,      # [B, L] packed segment ids
        pos: Optional[jnp.ndarray] = None,      # [B, L] within-segment positions
        pos_bos: Optional[jnp.ndarray] = None,  # [B, K] segment-start offsets
        pos_u: Optional[jnp.ndarray] = None,    # [B, K] query-u slots (0 = none)
        pos_v: Optional[jnp.ndarray] = None,    # [B, K] query-v slots (0 = none)
    ) -> jnp.ndarray:
        """Unpacked rows (seg=None): one example per row, '<q>' located
        in-jit, returns [B, C]. Packed rows (seg given): K examples per row
        behind a block-diagonal mask with segment-relative positions and
        host-precomputed readout slots, returns [B, K, C] — semantics per
        example are identical to the unpacked path."""
        h = transformer_embed(
            nn.Embed(self.vocab_size, self.d_model, embedding_init=_TRUNC,
                     name="embed"),
            nn.Embed(self.max_pos, self.d_model, embedding_init=_TRUNC,
                     name="pos"),
            x, pos)
        layer_cls = nn.remat(EncoderLayer, static_argnums=(3,)) if self.remat \
            else EncoderLayer
        cdtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        for i in range(self.nlayers):
            h = layer_cls(self.d_model, self.nhead, self.d_ff, self.p_drop,
                          self.use_flash, cdtype, self.sp_mesh,
                          self.moe_experts, self.moe_capacity, self.ep_mesh,
                          attn_p_drop=self.attn_p_drop,
                          mlp_p_drop=self.mlp_p_drop,
                          resid_p_drop=self.resid_p_drop,
                          ffn_p_drop=self.ffn_p_drop,
                          name=f"layer_{i}")(h, attn_mask, deterministic, seg)

        return transformer_readout(
            nn.LayerNorm(name="norm"),
            nn.Dense(self.num_classes, kernel_init=_TRUNC,
                     bias_init=nn.initializers.zeros, name="cls"),
            h, x, attn_mask, d_model=self.d_model, task=self.task,
            use_query_nodes=self.use_query_nodes, bos_id=self.bos_id,
            query_offsets=self.query_offsets, q_token_id=q_token_id,
            seg=seg, pos_bos=pos_bos, pos_u=pos_u, pos_v=pos_v)
