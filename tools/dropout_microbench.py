#!/usr/bin/env python
"""Microbench: how should the residual/FFN dropout mask be applied?

MFU_ATTRIB_2048.json (r5) attributes ~47 ms/step (7 MFU points) at
d2048 to the three per-layer residual/FFN blocked-byte dropout sites —
after the swap off flax's per-element bernoulli. This tool times one
encoder FFN block (ff1 -> relu -> drop -> ff2 -> drop) fwd+bwd at the
MFU shape under candidate mask-application strategies:

  none        no dropout (the ceiling)
  where       blocked-byte threefry mask, jnp.where (the r4 path)
  mul         same mask, applied as x * keep.astype(bf16) * scale
  bernoulli   flax-style full-threefry bernoulli (the r4 baseline)
  remat_drop  where-mask with jax.checkpoint around the drop sites so
              the bwd regenerates masks instead of loading them
  hash        counter-hash mask (ops/attention.hash_keep_mask): the
              flash kernel's triple32 finalizer over absolute element
              indices, one u32 word -> four mask bytes. ~10 u32 ops
              per word vs threefry's ~100, fuses like any elementwise
              op, and the bwd can regenerate it for the cost of an
              iota+hash instead of loading stored words.

Timing: K-iteration scanned fwd+bwd blocks, host-fetch timed (CLAUDE.md
tunnel discipline). Writes DROPOUT_MICROBENCH.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--len", dest="seq", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default="DROPOUT_MICROBENCH.json")
    args = ap.parse_args()

    from glearning_benchmark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from glearning_benchmark_tpu.ops.attention import (
        dropout_keep_mask, hash_keep_mask)

    d, b, l = args.d_model, args.batch, args.seq
    f = 4 * d
    p = 0.1
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, l, d), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (d, f), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(2), (f, d), jnp.bfloat16) * 0.02

    def drop_where(rng, y):
        keep, pe = dropout_keep_mask(rng, y.shape, p)
        return jnp.where(keep, y / (1.0 - pe), jnp.zeros((), y.dtype))

    def drop_mul(rng, y):
        keep, pe = dropout_keep_mask(rng, y.shape, p)
        return y * (keep.astype(y.dtype) * (1.0 / (1.0 - pe)))

    def drop_bernoulli(rng, y):
        keep = jax.random.bernoulli(rng, 1.0 - p, y.shape)
        return jnp.where(keep, y / (1.0 - p), jnp.zeros((), y.dtype))

    def drop_hash(rng, y):
        seed = jax.random.bits(rng, (), jnp.uint32)  # one threefry word
        keep, pe = hash_keep_mask(seed, y.shape, p)
        return jnp.where(keep, y / (1.0 - pe), jnp.zeros((), y.dtype))

    def block(dropfn, remat=False):
        def ffn(x, rng):
            r1, r2 = jax.random.split(rng)
            y = jnp.einsum("bld,df->blf", x, w1)
            y = jax.nn.relu(y)
            if dropfn is not None:
                dfn = jax.checkpoint(dropfn) if remat else dropfn
                y = dfn(r1, y)
            y = jnp.einsum("blf,fd->bld", y, w2)
            if dropfn is not None:
                dfn = jax.checkpoint(dropfn) if remat else dropfn
                y = dfn(r2, y)
            return y

        def loss(x, rng):
            return ffn(x, rng).astype(jnp.float32).sum()

        g = jax.grad(loss)

        def k_iters(x, key):
            def one(c, rng):
                gx = g(c, rng)
                # data dependence so the scan can't dead-code or overlap
                return c + gx * jnp.bfloat16(1e-6), ()
            c, _ = jax.lax.scan(one, x, jax.random.split(key, args.iters))
            return c[0, 0, 0].astype(jnp.float32)

        return jax.jit(k_iters)

    variants = [
        ("none", block(None)),
        ("where", block(drop_where)),
        ("mul", block(drop_mul)),
        ("bernoulli", block(drop_bernoulli)),
        ("remat_drop", block(drop_where, remat=True)),
        ("hash", block(drop_hash)),
        ("hash_remat", block(drop_hash, remat=True)),
    ]
    rows = []
    for name, fn in variants:
        float(np.asarray(fn(x, jax.random.PRNGKey(3))))  # compile+warm
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(x, jax.random.PRNGKey(4 + i))))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        rows.append({"variant": name, "fwdbwd_ms": round(best * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)

    base = {r["variant"]: r["fwdbwd_ms"] for r in rows}
    with open(args.out, "w") as fh:
        json.dump({"shape": {"d_model": d, "batch": b, "seq": l,
                             "d_ff": f, "p": p},
                   "note": "one FFN block (ff1->relu->drop->ff2->drop) "
                           "fwd+bwd, scanned K iters, host-fetch timed; "
                           "'none' is the ceiling, 'where' the shipped "
                           "path; x8 layers approximates the per-step "
                           "mlp-dropout cost in MFU_ATTRIB",
                   "rows": rows,
                   "dropout_cost_ms_per_block": {
                       r["variant"]: round(r["fwdbwd_ms"] - base["none"], 3)
                       for r in rows if r["variant"] != "none"}}, fh,
                  indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
