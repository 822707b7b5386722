#!/usr/bin/env python
"""MFU benchmark: training-step model-FLOPs utilization at production scale.

The reference's models are tiny (d_model 16-64) and its epochs are
overhead-bound there (tools/roofline.py / ROOFLINE.json), so kernel quality
is invisible at benchmark shapes. This tool measures where a production
deployment actually lives: a full jitted train step (fwd + bwd + AdamW,
donated buffers) on the flagship transformer at serving-scale shapes,
bf16 compute, flash attention on — and reports

    MFU = XLA-counted FLOPs / (step_time * peak_FLOPs)

with the FLOP count taken from the compiled executable's own
``cost_analysis()`` (no hand-derived 6*P*T estimate to game).

Run strictly serially against the tunneled TPU (CLAUDE.md):

    python tools/mfu_bench.py [--d-model 512 --layers 8 --len 1024 ...]

Writes MFU.json and prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peak: 197 TFLOP/s bf16 per chip (394 int8). Other chips via --peak.
PEAK_TFLOPS_BF16 = {"v5e": 197.0, "v5p": 459.0, "v4": 275.0, "cpu": 1.0}


def build_step(model, opt, n_steps: int):
    """K train steps inside ONE jitted lax.scan dispatch. Per-call timing
    through the tunneled device is corrupted by async dispatch latency
    (and at small shapes reports impossible >100% MFU); a scanned block is
    the same discipline the trainer uses (train.epochs_per_dispatch)."""
    import jax
    import optax
    from jax import lax

    def loss_fn(p, ids, mask, labels, rng):
        logits = model.apply({"params": p}, ids, mask, deterministic=False,
                             rngs={"dropout": rng})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    def one(carry, rng):
        p, opt_state, ids, mask, labels = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, ids, mask, labels, rng)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state, ids, mask, labels), loss

    def k_steps(p, opt_state, ids, mask, labels, key):
        carry, losses = lax.scan(
            one, (p, opt_state, ids, mask, labels),
            jax.random.split(key, n_steps))
        return carry[0], carry[1], losses[-1]

    return jax.jit(k_steps, donate_argnums=(0, 1))


def run_one(d_model: int, layers: int, heads: int, d_ff: int, seq: int,
            batch: int, steps: int, vocab: int, peak_tflops: float,
            use_flash: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from glearning_benchmark_tpu.models.transformer import SimpleTransformer
    from glearning_benchmark_tpu.utils import jaxcache

    jaxcache.enable_compilation_cache()

    model = SimpleTransformer(
        vocab_size=vocab, d_model=d_model, nhead=heads, nlayers=layers,
        d_ff=d_ff, p_drop=0.1, max_pos=seq, num_classes=2,
        use_query_nodes=False, task="cycle_check",
        use_flash=use_flash, compute_dtype="bfloat16")

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, vocab, size=(batch, seq)), jnp.int32)
    ids = ids.at[:, 0].set(1)
    mask = jnp.ones((batch, seq), bool)
    labels = jnp.asarray(rng.integers(0, 2, size=(batch,)), jnp.int32)

    params = jax.jit(lambda r: model.init(r, ids, mask, deterministic=True)
                     )(jax.random.PRNGKey(0))["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    opt = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = opt.init(params)
    step = build_step(model, opt, steps)

    key = jax.random.PRNGKey(1)
    xla_flops, flops_src = 0.0, "xla_cost_analysis"
    try:
        # AOT lower+compile so cost_analysis reports the whole K-step block
        compiled = step.lower(params, opt_state, ids, mask, labels, key).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        xla_flops = float(cost.get("flops", 0.0)) / steps if cost else 0.0
    except Exception as e:  # remote AOT compile can be version-locked out
        print(f"# cost_analysis unavailable ({type(e).__name__}); "
              "using analytic model FLOPs", file=sys.stderr, flush=True)
    if not xla_flops:
        # standard decoder-FLOPs model per step: fwd = 2*P*T + attention
        # 4*B*L^2*d per layer; train = 3x fwd (bwd ~ 2x fwd)
        flops_src = "analytic_6PT"
        attn = 4 * batch * layers * seq * seq * d_model
        xla_flops = 3.0 * (2.0 * n_params * batch * seq + attn)

    # warm-up dispatch: pays compile + first-touch; discarded
    params, opt_state, loss = step(params, opt_state, ids, mask, labels, key)
    jax.block_until_ready(loss)

    # timed: best of 2 single-dispatch K-step blocks (one host->device
    # round-trip per block; the block is device-bound)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, ids, mask, labels, key)
        jax.block_until_ready(loss)
        dts.append((time.perf_counter() - t0) / steps)
    dt = min(dts)

    tokens = batch * seq
    mfu = xla_flops / (dt * peak_tflops * 1e12) if xla_flops else float("nan")
    return {
        "d_model": d_model, "layers": layers, "heads": heads, "d_ff": d_ff,
        "seq": seq, "batch": batch, "params": n_params,
        "step_s": round(dt, 6), "tokens_per_s": round(tokens / dt),
        "xla_train_step_flops": xla_flops,
        "flops_source": flops_src,
        "peak_tflops": peak_tflops,
        "mfu": round(mfu, 4),
        "flash": use_flash,
        "final_loss": float(loss),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--d-model", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--ff-mult", type=int, default=4)
    ap.add_argument("--len", dest="seq", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--chip", default="v5e", choices=sorted(PEAK_TFLOPS_BF16))
    ap.add_argument("--peak", type=float, default=None,
                    help="peak TFLOP/s override")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--out", default="MFU.json")
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform
    peak = args.peak or PEAK_TFLOPS_BF16["cpu" if platform == "cpu"
                                         else args.chip]

    rows = []
    for dm in args.d_model:
        r = run_one(dm, args.layers, args.heads, args.ff_mult * dm, args.seq,
                    args.batch, args.steps, args.vocab, peak,
                    use_flash=not args.no_flash and platform != "cpu")
        r["platform"] = platform
        print(json.dumps(r), flush=True)
        rows.append(r)

    with open(args.out, "w") as f:
        json.dump({"chip": args.chip if platform != "cpu" else "cpu",
                   "note": "full train step (fwd+bwd+AdamW), bf16 compute, "
                           "FLOPs from compiled cost_analysis()",
                   "rows": rows}, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
