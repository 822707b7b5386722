"""Pipeline parallelism (PP) for the token transformers.

The reference has no distributed machinery at all (SURVEY §2.2); PP enters
this framework the same way TP (parallel/mesh.py) and SP
(ops/ring_attention.py) did — as a first-class TPU-native scale-out
component, config-driven (``parallel.pipe_stages``) and correctness-
validated on the virtual CPU mesh since the dev environment has one chip.

Design: GPipe-style stage pipeline over a ``'pipe'`` mesh axis inside
``shard_map``. Each stage owns a contiguous slice of encoder layers (the
per-layer parameter trees are stacked on a leading axis sharded over
'pipe'); microbatch activations stream stage-to-stage around the ICI ring
via ``lax.ppermute`` in a ``lax.scan`` over ticks. With S stages and M
microbatches the schedule runs T = M + S - 1 ticks; stage s processes
microbatch t - s at tick t (clamped garbage outside [0, M) — the standard
bubble — which is never selected into the output and therefore receives
zero cotangents). Embedding and readout stay replicated outside the
pipelined region: at benchmark scale they are a single gather and a [B, d]
matmul — pipelining them would add two more ppermute hops for no win.

The forward is built from the SAME building blocks as
``SimpleTransformer.__call__`` (transformer_embed / EncoderLayer.apply /
transformer_readout on the model's own parameter tree, stacked
functionally per step), so PP is a schedule change, not a math change —
tests/test_trainer_pp.py asserts exact (deterministic f32) equality
against the plain forward and DP-vs-DPxPP trajectory equivalence.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(params, nlayers: int):
    """Stack params['layer_0'..'layer_{n-1}'] leaf-wise on a new leading
    axis (the 'pipe'-sharded stage axis). A pure restructuring: gradients
    flow back through the stack to the original tree, so the optimizer,
    checkpoints and TP rule all keep seeing the unstacked layout."""
    layers = [params[f"layer_{i}"] for i in range(nlayers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def gpipe_layers(mesh: Mesh, stacked, h, mask, seg, layer_fn,
                 n_micro: int, rng: Optional[jnp.ndarray]):
    """Run the stacked encoder layers as a GPipe pipeline over 'pipe'.

    stacked: pytree with leading axis L (total layers), sharded over 'pipe'
             (L % S == 0; each stage applies its local L/S layers in order).
    h:       [B, L_seq, D] activations (any 'data'/'model' sharding — only
             'pipe' goes manual; GSPMD keeps managing the rest).
    mask:    [B, L_seq] bool; seg: [B, L_seq] int or None (packed rows).
    layer_fn(layer_params, h_mb, mask_mb, seg_mb, rng_or_None) -> h_mb.
    rng:     per-step dropout key (replicated) or None (deterministic).
    """
    S = int(mesh.shape["pipe"])
    if S == 1:  # degenerate mesh: plain sequential stack
        def seq_body(hh):
            nl = jax.tree.leaves(stacked)[0].shape[0]
            def one(carry, xs):
                lp, i = xs
                k = jax.random.fold_in(rng, i) if rng is not None else None
                return layer_fn(lp, carry, mask, seg, k), None
            out, _ = jax.lax.scan(one, hh, (stacked, jnp.arange(nl)))
            return out
        return seq_body(h)

    T = n_micro + S - 1
    use_seg = seg is not None
    use_rng = rng is not None

    def body(stk, h, mask, seg, rng):
        s = jax.lax.axis_index("pipe")
        mb = h.shape[0] // n_micro  # logical batch (partial-manual)
        hm = h.reshape(n_micro, mb, h.shape[1], h.shape[2])
        mm = mask.reshape(n_micro, mb, mask.shape[1])
        sm = seg.reshape(n_micro, mb, seg.shape[1]) if use_seg else None
        n_local = jax.tree.leaves(stk)[0].shape[0]

        def apply_stage(act, m, sg, key):
            def one(carry, xs):
                lp, i = xs
                k = jax.random.fold_in(key, i) if use_rng else None
                return layer_fn(lp, carry, m, sg, k), None
            act, _ = jax.lax.scan(one, act, (stk, jnp.arange(n_local)))
            return act

        def tick(carry, t):
            act = carry
            # stage 0 reads microbatch t from the (pipe-replicated) input;
            # stage s>0 consumes the previous tick's ppermuted activations.
            # Ticks outside a stage's live window [s, s+M) compute on
            # clamped-real masks (no NaN hazard) and are never selected.
            t_in = jnp.clip(t, 0, n_micro - 1)
            idx = jnp.clip(t - s, 0, n_micro - 1)
            my_in = jnp.where(
                s == 0, jax.lax.dynamic_index_in_dim(hm, t_in, 0, False), act)
            m = jax.lax.dynamic_index_in_dim(mm, idx, 0, False)
            sg = (jax.lax.dynamic_index_in_dim(sm, idx, 0, False)
                  if use_seg else None)
            # dropout key unique per (tick, stage); apply_stage folds the
            # local layer index on top -> unique per (microbatch, layer)
            key = jax.random.fold_in(rng, t * S + s) if use_rng else None
            out = apply_stage(my_in, m, sg, key)
            nxt = jax.lax.ppermute(out, "pipe",
                                   [(i, (i + 1) % S) for i in range(S)])
            return nxt, out

        init = jnp.zeros((mb,) + h.shape[1:], h.dtype)
        _, outs = jax.lax.scan(tick, init, jnp.arange(T))  # [T, mb, Ls, D]
        # stage S-1's outputs at ticks S-1..T-1 are microbatches 0..M-1;
        # masked psum replicates the result across 'pipe' so the readout
        # (outside shard_map) sees one coherent batch
        tail = jax.lax.dynamic_slice_in_dim(outs, S - 1, n_micro, 0)
        is_last = (s == S - 1).astype(h.dtype)
        res = jax.lax.psum(tail * is_last, "pipe")
        return res.reshape(h.shape)

    # partial-manual shard_map (the ring-attention pattern,
    # ops/ring_attention.py:114-139): only 'pipe' is manual — the batch
    # axis keeps whatever DP/TP sharding GSPMD gave it, with no
    # divisibility constraint at this boundary. in_specs therefore only
    # place the stacked layer axis on 'pipe'; everything else is logically
    # global.
    # one shard_map for all four seg/rng combinations: optional operands
    # join the arg list (and an extra P() spec) only when present, and the
    # wrapper threads them back into body's fixed signature
    extras = ([seg] if use_seg else []) + ([rng] if use_rng else [])

    def wrapped(stk, hh, mm, *opt):
        it = iter(opt)
        sg = next(it) if use_seg else None
        k = next(it) if use_rng else None
        return body(stk, hh, mm, sg, k)

    f = jax.shard_map(wrapped, mesh=mesh,
                      in_specs=(P("pipe"),) + (P(),) * (2 + len(extras)),
                      out_specs=P(), axis_names={"pipe"}, check_vma=False)
    return f(stacked, h, mask, *extras)


def pp_transformer_forward(mesh: Mesh, model, params, x, attn_mask, *,
                           q_token_id=None, deterministic: bool = True,
                           rng: Optional[jnp.ndarray] = None,
                           n_micro: Optional[int] = None,
                           seg=None, pos=None, pos_bos=None,
                           pos_u=None, pos_v=None):
    """Pipeline-parallel forward of a SimpleTransformer parameter tree.

    Drop-in replacement for ``model.apply({'params': params}, ...)`` on a
    ('data', 'pipe') mesh: same parameter tree, same outputs (exactly, in
    deterministic f32 — the pipeline reuses transformer_embed /
    EncoderLayer / transformer_readout), different execution schedule.
    Dropout uses per-(microbatch, layer) folded keys — a different
    Bernoulli stream than the unsharded forward, same semantics (the
    documented contract for the flash/ring paths as well).
    """
    from ..models.transformer import (EncoderLayer, transformer_embed,
                                      transformer_readout)

    S = int(mesh.shape["pipe"])
    L = int(model.nlayers)
    # the pipelined EncoderLayer is rebuilt below WITHOUT sp_mesh/moe —
    # refuse rather than silently dropping those features (the trainer
    # guards its own mesh construction, but a caller-supplied mesh can
    # reach here with either configured)
    if getattr(model, "sp_mesh", None) is not None:
        raise ValueError("pipeline parallelism does not compose with "
                         "sequence-parallel ring attention (model.sp_mesh)")
    if getattr(model, "moe_experts", 0):
        raise ValueError("pipeline parallelism does not compose with "
                         "MoE FFNs (model.moe_experts)")
    if L % S != 0:
        raise ValueError(f"model.nlayers={L} must divide over "
                         f"pipe_stages={S}")
    n_micro = int(n_micro or S)
    if x.shape[0] % n_micro != 0:
        raise ValueError(f"batch {x.shape[0]} not divisible by "
                         f"pipe microbatches {n_micro}")

    embed = nn.Embed(model.vocab_size, model.d_model)
    posemb = nn.Embed(model.max_pos, model.d_model)
    h = transformer_embed(
        lambda t: embed.apply({"params": params["embed"]}, t),
        lambda t: posemb.apply({"params": params["pos"]}, t),
        x, pos)

    cdtype = jnp.bfloat16 if model.compute_dtype == "bfloat16" else jnp.float32
    layer = EncoderLayer(model.d_model, model.nhead, model.d_ff, model.p_drop,
                         model.use_flash, cdtype, None)

    def layer_fn(lp, hh, m, sg, key):
        rngs = {"dropout": key} if key is not None else None
        return layer.apply({"params": lp}, hh, m, deterministic, sg,
                           rngs=rngs)

    if model.remat:
        layer_fn = jax.checkpoint(layer_fn)

    stacked = stack_layer_params(params, L)
    h = gpipe_layers(mesh, stacked, h, attn_mask, seg, layer_fn,
                     n_micro, None if deterministic else rng)

    norm = nn.LayerNorm()
    cls = nn.Dense(model.num_classes)
    return transformer_readout(
        lambda t: norm.apply({"params": params["norm"]}, t),
        lambda t: cls.apply({"params": params["cls"]}, t),
        h, x, attn_mask, d_model=model.d_model, task=model.task,
        use_query_nodes=model.use_query_nodes, bos_id=model.bos_id,
        query_offsets=model.query_offsets, q_token_id=q_token_id,
        seg=seg, pos_bos=pos_bos, pos_u=pos_u, pos_v=pos_v)
