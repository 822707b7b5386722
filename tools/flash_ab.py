#!/usr/bin/env python
"""A/B: Pallas flash attention vs XLA dot-general attention at the
benchmark's shapes (VERDICT r1 next-step #3).

Times forward and forward+backward at steady state for the shapes the
training configs actually run. Timing methodology: each measurement is a
jitted ``lax.scan`` of ``steps`` *dependent* invocations per dispatch,
timed by fetching a host value that data-depends on every iteration
(``block_until_ready`` can ack before device completion through the
tunnel — see CLAUDE.md timing discipline); best of ``reps`` dispatches.

    ibtt  synthetic: B=128 L=640  H=4 D=4    (d_model 16)
    agtt  synthetic: B=128 L=640  H=4 D=8    (d_model 32)
    ibtt  zinc:      B=128 L=1024 H=4 D=4    (d_model 16 — the one config
                                              that ships use_flash: true)
    agtt  zinc:      B=128 L=1024 H=4 D=16   (d_model 64)
    long  (stress):  B=16  L=2048 H=4 D=16
    xl / xxl:        L=4096/8192 D=64 — NOT benchmark shapes; they locate
                     the crossover where streaming beats materializing the
                     [L, L] matrix (the regime flash kernels exist for)

Decision rule (north star: Pallas only where XLA is not at roofline): if
flash wins at the benchmark shapes, flip model.use_flash default; else
record the roofline note justifying XLA. Writes FLASH_AB.json.

    python tools/flash_ab.py            # on the TPU (serial — single client)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    ("ibtt-sp", 128, 640, 4, 4),
    ("agtt-sp", 128, 640, 4, 8),
    ("ibtt-zinc", 128, 1024, 4, 4),
    ("agtt-zinc", 128, 1024, 4, 16),
    ("long", 16, 2048, 4, 16),
    ("xl", 4, 4096, 8, 64),
    ("xxl", 2, 8192, 8, 64),
]


def bench(fn, args, steps=100, reps=3):
    """Per-invocation seconds for ``fn(*args)``, measured as a jitted
    lax.scan of ``steps`` *dependent* invocations per dispatch, timed by a
    host value fetch.

    Round-2's per-call block_until_ready timing produced mutually
    inconsistent rows through the tunneled backend (VERDICT r2 weak #4:
    0.076ms vs 28.7ms at the same shape) — the same async-ack failure mode
    as the old MFU bench. The scan carries a scalar derived from each
    output into a numerically-neutral perturbation of q (x * (1 + c*1e-30)
    rounds to x, but XLA cannot fold a dynamic multiplier), so iterations
    cannot be hoisted or elided, and np.asarray on the final carry cannot
    return before the device finished."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def one(carry, _):
        scale = (jnp.float32(1) + carry * jnp.float32(1e-30))
        q = (args[0].astype(jnp.float32) * scale).astype(args[0].dtype)
        out = fn(q, *args[1:])
        leaf = jax.tree.leaves(out)[0]
        return leaf.ravel()[0].astype(jnp.float32), ()

    @jax.jit
    def k_steps(c0):
        c, _ = jax.lax.scan(one, c0, None, length=steps)
        return c

    c0 = jnp.float32(0.0)
    float(np.asarray(k_steps(c0)))  # compile + warm-up dispatch
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = k_steps(c0)
        float(np.asarray(r))  # device-dependent fetch: cannot ack early
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


ROWS_JSONL = "FLASH_AB.rows.jsonl"  # incremental resume log (tunnel can die)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="",
                    help="comma-separated shape names to (re)run; others are "
                         f"taken from {ROWS_JSONL} if present")
    args = ap.parse_args()
    only = set(s for s in args.shapes.split(",") if s)

    from glearning_benchmark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from glearning_benchmark_tpu.ops.attention import multi_head_attention
    from glearning_benchmark_tpu.ops.pallas_attention import flash_attention

    print(f"backend: {jax.default_backend()}", flush=True)
    done = {}
    if os.path.exists(ROWS_JSONL):
        with open(ROWS_JSONL) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done[r["shape"]] = r
                except json.JSONDecodeError:
                    continue
    results = []
    for name, b, l, h, d, in SHAPES:
        if only and name not in only:
            if name in done:
                results.append(done[name])
                print(f"(resume) {json.dumps(done[name])}", flush=True)
            else:
                # a silently absent row would shrink the rewritten
                # FLASH_AB.json and quietly drop a published shape
                print(f"[warn] shape '{name}' not requested and not cached "
                      f"in {ROWS_JSONL} — FLASH_AB.json will lack its row",
                      file=sys.stderr, flush=True)
            continue
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        dt = jnp.bfloat16
        q = jax.random.normal(kq, (b, l, h, d), dt)
        k = jax.random.normal(kk, (b, l, h, d), dt)
        v = jax.random.normal(kv, (b, l, h, d), dt)
        # realistic raggedness: valid lengths 50-100% of L
        lens = jax.random.randint(jax.random.PRNGKey(1), (b,), l // 2, l + 1)
        mask = jnp.arange(l)[None, :] < lens[:, None]

        xla_f = jax.jit(lambda q, k, v, m: multi_head_attention(q, k, v, m))
        fla_f = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m))

        def loss_xla(q, k, v, m):
            return multi_head_attention(q, k, v, m).astype(jnp.float32).sum()

        def loss_fla(q, k, v, m):
            return flash_attention(q, k, v, m).astype(jnp.float32).sum()

        xla_g = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        fla_g = jax.jit(jax.grad(loss_fla, argnums=(0, 1, 2)))

        row = {"shape": name, "B": b, "L": l, "H": h, "D": d}
        row["xla_fwd_ms"] = round(bench(xla_f, (q, k, v, mask)) * 1e3, 3)
        row["flash_fwd_ms"] = round(bench(fla_f, (q, k, v, mask)) * 1e3, 3)
        row["xla_fwdbwd_ms"] = round(bench(xla_g, (q, k, v, mask)) * 1e3, 3)
        row["flash_fwdbwd_ms"] = round(bench(fla_g, (q, k, v, mask)) * 1e3, 3)
        row["fwd_speedup"] = round(row["xla_fwd_ms"] / row["flash_fwd_ms"], 2)
        row["fwdbwd_speedup"] = round(row["xla_fwdbwd_ms"] / row["flash_fwdbwd_ms"], 2)

        # training variant: attention-prob dropout on both sides (the torch
        # default the synthetic configs must reproduce — trainer uses
        # p_drop=0.1). XLA draws bernoulli; flash hashes in-kernel.
        p = 0.1
        rng0 = jax.random.PRNGKey(2)
        seed = jnp.zeros((1, 1), jnp.int32) + 7

        def loss_xla_d(q, k, v, m):
            return multi_head_attention(
                q, k, v, m, dropout_rate=p, dropout_rng=rng0
            ).astype(jnp.float32).sum()

        def loss_fla_d(q, k, v, m):
            return flash_attention(
                q, k, v, m, p_drop=p, seed=seed
            ).astype(jnp.float32).sum()

        xla_gd = jax.jit(jax.grad(loss_xla_d, argnums=(0, 1, 2)))
        fla_gd = jax.jit(jax.grad(loss_fla_d, argnums=(0, 1, 2)))
        row["xla_drop_fwdbwd_ms"] = round(bench(xla_gd, (q, k, v, mask)) * 1e3, 3)
        row["flash_drop_fwdbwd_ms"] = round(bench(fla_gd, (q, k, v, mask)) * 1e3, 3)
        row["drop_fwdbwd_speedup"] = round(
            row["xla_drop_fwdbwd_ms"] / row["flash_drop_fwdbwd_ms"], 2)

        # packed variant: ~4 segments per row (block-diagonal mask), the
        # shape the dataset.pack=true training step actually runs
        nseg = 4
        seg = jnp.minimum(jnp.arange(l)[None, :] // (l // nseg), nseg - 1) + 1
        seg = jnp.where(mask, jnp.broadcast_to(seg, (b, l)), 0).astype(jnp.int32)

        def loss_xla_p(q, k, v, s):
            return multi_head_attention(
                q, k, v, seg=s, dropout_rate=p, dropout_rng=rng0
            ).astype(jnp.float32).sum()

        def loss_fla_p(q, k, v, s):
            return flash_attention(
                q, k, v, seg=s, p_drop=p, seed=seed
            ).astype(jnp.float32).sum()

        xla_gp = jax.jit(jax.grad(loss_xla_p, argnums=(0, 1, 2)))
        fla_gp = jax.jit(jax.grad(loss_fla_p, argnums=(0, 1, 2)))
        row["xla_packed_fwdbwd_ms"] = round(bench(xla_gp, (q, k, v, seg)) * 1e3, 3)
        row["flash_packed_fwdbwd_ms"] = round(bench(fla_gp, (q, k, v, seg)) * 1e3, 3)
        row["packed_fwdbwd_speedup"] = round(
            row["xla_packed_fwdbwd_ms"] / row["flash_packed_fwdbwd_ms"], 2)
        print(json.dumps(row), flush=True)
        with open(ROWS_JSONL, "a") as f:
            f.write(json.dumps(row) + "\n")
        results.append(row)

    with open("FLASH_AB.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "dtype": "bfloat16",
                   "rows": results}, f, indent=1)
    print("wrote FLASH_AB.json", flush=True)
    # compact the append-only resume log: keep the newest row per shape so
    # full reruns don't accumulate duplicates forever
    latest = {}
    if os.path.exists(ROWS_JSONL):
        with open(ROWS_JSONL) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    latest[r["shape"]] = r
                except (json.JSONDecodeError, KeyError):
                    continue
    for r in results:
        latest[r["shape"]] = r
    with open(ROWS_JSONL, "w") as f:
        for r in latest.values():
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
