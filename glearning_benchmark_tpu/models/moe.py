"""Switch-style mixture-of-experts FFN with expert parallelism (EP).

The reference workload has no MoE (SURVEY §2.2 documents EP as N/A for
parity), so this is pure scale-out headroom, built the same way TP/SP/PP
were: opt-in via config (``model.moe_experts``), trajectory-testable on
the virtual CPU mesh, and TPU-first in shape. The dense one-hot dispatch
keeps everything as static-shape batched matmuls on the MXU — no ragged
gather/scatter:

    route   : softmax(router(x)) -> top-1 expert per token (Switch)
    dispatch: one-hot [B, L, E, C] with per-row capacity C = cf*L/E —
              tokens are grouped by batch row (the standard Switch/GSPMD
              grouping), so the dispatch tensors stay LINEAR in the
              total token count (a single global group would make them
              O(T^2)). Overflow tokens are dropped — the encoder's
              residual connection carries them, the standard Switch
              behavior.
    experts : [E, B, C, d] @ w1[E, d, f] -> relu -> @ w2[E, f, d]
              (batched per expert; rows flattened over B*C on the MXU)
    combine : router-prob-weighted one-hot gather back to [B, L, d]

EP sharding: the expert weight stacks carry a leading E axis; with
``parallel.expert_shards: N`` the trainer builds a ('data', 'expert')
mesh and the param rule shards that axis over 'expert' — GSPMD then
partitions the batched expert matmuls per device and inserts the
dispatch/combine collectives (the scaling-book recipe: annotate
shardings, let XLA place the all-to-alls).

Manual dispatch (``parallel.ep_manual: true``): the performance path when
profiling shows GSPMD's inserted collectives off roofline. The batch also
shards over the 'expert' axis and the dispatch/combine become explicit
``lax.all_to_all`` exchanges inside ``shard_map`` (``_manual_ep_ffn``):
each device routes its local tokens' capacity slots to the experts'
owners and gets them back after the expert matmuls. Per-device ICI
traffic is the capacity-selected slots only, ~cf·B_loc·L·d — an all_to_all
— whereas the auto path must all_gather full activations over 'expert'
(~(ep-1)·B_loc·L·d), so manual wins by ~ep/cf. Identical math: same
dispatch tensors, same per-expert matmul rows — the FFN block is
bit-equal to the GSPMD path in deterministic f32 (tests/test_moe.py;
full-model outputs differ only by XLA fusing the surrounding non-MoE ops
differently, ~2e-8).

Load balance: the Switch auxiliary loss E * sum_e(frac_tokens_e *
mean_prob_e) is sowed into the 'losses' collection; the trainer adds it
(weight ``model.moe_aux_weight``) when present.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def _manual_ep_ffn(mesh, x, dispatch, top_p, w1, b1, w2, b2, *,
                   dtype, p_drop, rng):
    """Expert FFN with explicit all-to-all dispatch over the 'expert' axis.

    Same math as the einsum path in ``SwitchFFN.__call__`` (same dispatch
    tensors, same per-expert matmul rows — bit-equal in deterministic f32),
    different communication schedule: tokens' capacity slots travel to the
    expert owners and back via two ``lax.all_to_all`` exchanges instead of
    GSPMD replicating activations over 'expert'. Dropout inside the manual
    region draws from a per-device folded key — a different Bernoulli
    stream than the auto path's blocked-byte mask, same semantics (the
    documented contract for the flash/ring paths as well).
    """
    if set(mesh.axis_names) != {"data", "expert"}:
        raise ValueError("manual EP dispatch needs a ('data','expert') mesh, "
                         f"got {mesh.axis_names}")
    ep = int(mesh.shape["expert"])
    dp = int(mesh.shape["data"])
    b = x.shape[0]
    e = w1.shape[0]
    if b % (dp * ep):
        raise ValueError(f"batch {b} must divide over data*expert = "
                         f"{dp}*{ep} for manual EP dispatch")
    if e % ep:
        raise ValueError(f"n_experts {e} must divide over expert_shards {ep}")
    use_rng = rng is not None

    def body(x, dispatch, top_p, w1, b1, w2, b2, *opt):
        # local: x [B_loc, L, d]; dispatch [B_loc, L, E, C]; w1 [E_loc, d, f]
        xin = jnp.einsum("blec,bld->ebcd", dispatch.astype(dtype),
                         x.astype(dtype))                # [E, B_loc, C, d]
        # dispatch exchange: expert block j -> device j along 'expert';
        # received token blocks concatenate on the row axis
        xin = jax.lax.all_to_all(xin, "expert", split_axis=0, concat_axis=1,
                                 tiled=True)             # [E_loc, ep*B_loc, C, d]
        h = jnp.einsum("ebcd,edf->ebcf", xin, w1.astype(dtype))
        h = nn.relu(h + b1[:, None, None, :].astype(dtype))
        if use_rng:
            k = jax.random.fold_in(
                jax.random.fold_in(opt[0], jax.lax.axis_index("expert")),
                jax.lax.axis_index("data"))
            keep = jax.random.bernoulli(k, 1.0 - p_drop, h.shape)
            h = jnp.where(keep, h / (1.0 - p_drop), 0).astype(h.dtype)
        h = jnp.einsum("ebcf,efd->ebcd", h, w2.astype(dtype))
        h = h + b2[:, None, None, :].astype(dtype)
        # combine exchange: token blocks return to their home devices;
        # received expert blocks concatenate back to the global E order
        h = jax.lax.all_to_all(h, "expert", split_axis=1, concat_axis=0,
                               tiled=True)               # [E, B_loc, C, d]
        combine = dispatch * top_p[..., None, None]
        return jnp.einsum("blec,ebcd->bld", combine.astype(dtype), h)

    tok = P(("data", "expert"))          # batch rows over BOTH axes
    exp = P("expert")                    # expert stacks over 'expert' only
    extras = (rng,) if use_rng else ()
    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tok, tok, tok, exp, exp, exp, exp)
                      + ((P(),) if use_rng else ()),
                      out_specs=tok, check_vma=False)
    return f(x, dispatch, top_p, w1, b1, w2, b2, *extras)


class SwitchFFN(nn.Module):
    """Drop-in for the encoder's Dense(d_ff) -> ReLU -> Dense(d) block."""

    d_model: int
    d_ff: int
    n_experts: int
    capacity_factor: float = 1.25
    p_drop: float = 0.1
    dtype: Any = jnp.float32
    ep_mesh: Any = None  # ('data','expert') Mesh -> manual all-to-all dispatch

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray,
                 deterministic: bool) -> jnp.ndarray:
        b, l, d = x.shape
        e = self.n_experts
        # PER-ROW capacity (group = batch row): covers a perfectly balanced
        # router at factor 1.0. A single global group (C = cf*B*L/E) would
        # make the [.., E, C] dispatch tensors quadratic in the token count;
        # per-row grouping keeps them at cf*B*L^2/... = linear in B.
        cap = max(1, int(self.capacity_factor * l / e))

        vf = valid.astype(self.dtype)                            # [B, L]

        # router in f32 (tiny; routing decisions should not dither in bf16)
        logits = nn.Dense(e, name="router", kernel_init=_TRUNC,
                          dtype=jnp.float32)(x.astype(jnp.float32))
        probs = nn.softmax(logits, axis=-1)                      # [B, L, E]
        top = jnp.argmax(probs, axis=-1)                         # [B, L]
        top_p = jnp.take_along_axis(probs, top[..., None], -1)[..., 0]

        onehot = nn.one_hot(top, e, dtype=jnp.float32) * vf[..., None]
        # position of each token within its expert's per-row queue
        # (first-come): tokens beyond capacity get dispatch 0 and ride the
        # residual
        pos = jnp.cumsum(onehot, axis=1) * onehot - 1.0          # [B, L, E]
        keep = (pos >= 0) & (pos < cap)
        pos_oh = nn.one_hot(pos.astype(jnp.int32), cap,
                            dtype=jnp.float32) * keep[..., None].astype(jnp.float32)
        dispatch = onehot[..., None] * pos_oh                    # [B, L, E, C]

        # Switch aux loss: E * sum_e(fraction_of_tokens_e * mean_prob_e),
        # over ALL valid tokens (= E when perfectly balanced)
        denom = jnp.clip(vf.sum(), 1.0)
        frac = onehot.sum((0, 1)) / denom                        # [E]
        mean_p = (probs * vf[..., None]).sum((0, 1)) / denom
        self.sow("losses", "moe_aux", e * jnp.sum(frac * mean_p))

        w1 = self.param("w1", _TRUNC, (e, d, self.d_ff), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, self.d_ff),
                        jnp.float32)
        w2 = self.param("w2", _TRUNC, (e, self.d_ff, d), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)

        if self.ep_mesh is not None:
            drop = (not deterministic) and self.p_drop > 0
            return _manual_ep_ffn(
                self.ep_mesh, x, dispatch, top_p, w1, b1, w2, b2,
                dtype=self.dtype, p_drop=self.p_drop,
                rng=self.make_rng("dropout") if drop else None)

        xin = jnp.einsum("blec,bld->ebcd", dispatch.astype(self.dtype),
                         x.astype(self.dtype))                   # [E, B, C, d]
        h = jnp.einsum("ebcd,edf->ebcf", xin, w1.astype(self.dtype))
        h = nn.relu(h + b1[:, None, None, :].astype(self.dtype))
        if not deterministic and self.p_drop > 0:
            # quantized blocked-byte mask (ops/attention.cheap_dropout) —
            # same swap as the encoder's residual/FFN sites; the manual EP
            # path below keeps its per-device folded bernoulli (documented
            # same-semantics-different-stream contract)
            from ..ops.attention import cheap_dropout
            h = cheap_dropout(self.make_rng("dropout"), h, self.p_drop)
        h = jnp.einsum("ebcf,efd->ebcd", h, w2.astype(self.dtype))
        h = h + b2[:, None, None, :].astype(self.dtype)

        combine = dispatch * top_p[..., None, None]              # [B, L, E, C]
        out = jnp.einsum("blec,ebcd->bld", combine.astype(self.dtype), h)
        return out
