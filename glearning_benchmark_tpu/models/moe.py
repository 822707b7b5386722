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

Load balance: the Switch auxiliary loss E * sum_e(frac_tokens_e *
mean_prob_e) is sowed into the 'losses' collection; the trainer adds it
(weight ``model.moe_aux_weight``) when present.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


class SwitchFFN(nn.Module):
    """Drop-in for the encoder's Dense(d_ff) -> ReLU -> Dense(d) block."""

    d_model: int
    d_ff: int
    n_experts: int
    capacity_factor: float = 1.25
    p_drop: float = 0.1
    dtype: Any = jnp.float32

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

        xin = jnp.einsum("blec,bld->ebcd", dispatch.astype(self.dtype),
                         x.astype(self.dtype))                   # [E, B, C, d]
        h = jnp.einsum("ebcd,edf->ebcf", xin, w1.astype(self.dtype))
        h = nn.relu(h + b1[:, None, None, :].astype(self.dtype))
        h = nn.Dropout(self.p_drop, deterministic=deterministic)(h)
        h = jnp.einsum("ebcf,efd->ebcd", h, w2.astype(self.dtype))
        h = h + b2[:, None, None, :].astype(self.dtype)

        combine = dispatch * top_p[..., None, None]              # [B, L, E, C]
        out = jnp.einsum("blec,ebcd->bld", combine.astype(self.dtype), h)
        return out
