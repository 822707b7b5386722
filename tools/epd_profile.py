#!/usr/bin/env python
"""Attribute the ibtt-cycle K=64 per-epoch floor (VERDICT r3 next-step #3).

EPD_SWEEP.json: ibtt-cycle flattens at 0.123 s/epoch with dispatch already
amortized — ~40x above the ~3 ms MXU bound — while mpnn lands within ~2x of
its bound with the same machinery. This tool rebuilds the exact ibtt-cycle
training block (same bundle, model, optimizer, scan structure as
train/trainer.py make_epoch_fns:294-429) and times VARIANTS of the K-epoch
block to attribute the floor:

    full        train + per-epoch val eval + on-device best-epoch selection
    train_only  the inner train scan alone
    eval_only   K x val-split eval_core alone
    sel_only    K x best-state jnp.where selection alone
    gather_only K x (epoch's batch gathers + reduce) alone
    nodrop      full block with dropout rate 0 (isolates the [B,H,L,L]
                threefry attention-dropout mask cost)
    rbg         full block under jax.random rbg keys (train.prng_impl: rbg)

Timing: one jitted dispatch per block; a host fetch of the stacked stats
(data-dependent on every epoch) closes the measurement — block_until_ready
can ack early through the tunnel (CLAUDE.md timing discipline). Best of
--reps blocks after a discarded compile/warm-up block. Writes
EPD_PROFILE.json.

    python tools/epd_profile.py        # on the TPU (serial — single client)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_setup(dropout: float | None = None):
    """The ibtt-cycle campaign setup, assembled from the trainer's own
    pieces (build_dataset/build_model, trainer.py:553-757)."""
    import optax

    from glearning_benchmark_tpu.train.trainer import (
        build_dataset, build_model)
    from glearning_benchmark_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, "configs/ibtt_graph_token.yaml"))
    if dropout is not None:
        cfg["model"]["dropout"] = dropout
    bundle = build_dataset("ibtt", cfg["dataset"], seed=0)
    model = build_model("ibtt", cfg, bundle)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(cfg["train"]["lr"],
                                 weight_decay=cfg["train"]["weight_decay"]))
    return cfg, bundle, model, tx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "EPD_PROFILE.json"))
    args = ap.parse_args()

    from glearning_benchmark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from glearning_benchmark_tpu.train.trainer import (
        _apply_model, _loss_and_stats, _loss_inputs, make_batches)

    cfg, bundle, model, tx = build_setup()
    task, num_classes = bundle.task, bundle.num_classes
    K = args.k
    bs = int(cfg["train"]["batch_size"])

    tr_arrays = {k: jnp.asarray(v) for k, v in bundle.splits["train"].items()}
    n_eval = max(bundle.n("val"), bundle.n("test"), 1)
    va_host = bundle.splits["val"]
    nva = len(va_host["y"])
    if nva < n_eval:  # same val/test row padding as the trainer
        va_host = {k: np.concatenate(
            [v, np.zeros((n_eval - nva,) + v.shape[1:], dtype=v.dtype)])
            for k, v in va_host.items()}
    va_arrays = {k: jnp.asarray(v) for k, v in va_host.items()}

    n_train = len(bundle.splits["train"]["y"])
    train_bs = min(bs, n_train)
    eval_nb = max(1, (n_eval + bs - 1) // bs)
    vidx, vvalid = make_batches(nva, bs, None, pad_to_nb=eval_nb)
    vidx, vvalid = jnp.asarray(vidx), jnp.asarray(vvalid)

    shuffle = np.random.default_rng(0)
    idx_k = np.stack([make_batches(n_train, train_bs, shuffle)[0]
                      for _ in range(K)])
    valid_one = make_batches(n_train, train_bs, None)[1]
    valid_k = np.ascontiguousarray(
        np.broadcast_to(valid_one, (K,) + valid_one.shape))
    idx_k, valid_k = jnp.asarray(idx_k), jnp.asarray(valid_k)
    nb = idx_k.shape[1]
    print(f"# rows={n_train} train_bs={train_bs} nb={nb} "
          f"bucket={tr_arrays['ids'].shape[1]} eval_rows={n_eval} "
          f"eval_nb={eval_nb} eval_bucket={va_arrays['ids'].shape[1]} K={K}",
          flush=True)

    def gather(arrays, idx):
        return {k: v[idx] for k, v in arrays.items()}

    def make_block(mdl, do_train=True, do_eval=True, do_sel=True,
                   gather_only=False, fwd_only=False, no_update=False):
        """The trainer's epoch_body (trainer.py:394-425) with ablation
        flags; identical math when all flags are on. ``fwd_only`` runs the
        loss without grad (fwd/bwd split); ``no_update`` computes grads but
        skips clip+AdamW+apply (optimizer cost)."""

        def train_one_epoch(params, opt_state, idx, valid, rng):
            def step(carry, xs):
                params, opt_state, rng = carry
                bidx, bvalid = xs
                rng, drop = jax.random.split(rng)
                batch = gather(tr_arrays, bidx)
                if gather_only:
                    s = sum(jnp.sum(v) for v in jax.tree.leaves(batch)
                            if v.dtype != bool)
                    return (params, opt_state, rng), {
                        "loss_sum": s.astype(jnp.float32)}

                def loss_fn(p):
                    logits, _, _ = _apply_model(
                        mdl, {"params": p}, batch, bundle, True, drop)
                    lg, y, lvalid = _loss_inputs(logits, batch, bvalid)
                    loss, stats = _loss_and_stats(lg, y, lvalid, task,
                                                  num_classes)
                    return loss, stats

                if fwd_only:
                    loss, stats = loss_fn(params)
                    return (params, opt_state, rng), stats
                (loss, stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                if no_update:
                    # keep grads live via a scalar fold so XLA can't DCE bwd
                    g0 = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
                    stats = dict(stats)
                    stats["loss_sum"] = stats["loss_sum"] + 0.0 * g0
                    return (params, opt_state, rng), stats
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), stats

            (params, opt_state, _), stats = jax.lax.scan(
                step, (params, opt_state, rng), (idx, valid))
            return params, opt_state, jax.tree.map(
                lambda s: s.sum(axis=0), stats)

        def eval_core(params):
            def step(carry, xs):
                bidx, bvalid = xs
                batch = gather(va_arrays, bidx)
                logits, _, _ = _apply_model(
                    mdl, {"params": params}, batch, bundle, False, None)
                lg, y, lvalid = _loss_inputs(logits, batch, bvalid)
                _, stats = _loss_and_stats(lg, y, lvalid, task, num_classes)
                return carry, stats

            _, stats = jax.lax.scan(step, None, (vidx, vvalid))
            return jax.tree.map(lambda s: s.sum(axis=0), stats)

        def block(params, opt_state, idx_k, valid_k, rng):
            def epoch_body(carry, xs):
                params, opt_state, rng, b_params, b_opt, b_metric = carry
                idx, valid = xs
                rng, ep_rng = jax.random.split(rng)
                tr_stats = {"loss_sum": jnp.float32(0)}
                if do_train or gather_only:
                    params, opt_state, tr_stats = train_one_epoch(
                        params, opt_state, idx, valid, ep_rng)
                va_stats = {"loss_sum": jnp.float32(0)}
                m = jnp.float32(0)
                if do_eval:
                    va_stats = eval_core(params)
                    m = jnp.trace(va_stats["cm"]) / jnp.clip(
                        va_stats["count"], 1.0)
                if do_sel:
                    imp = m > b_metric
                    sel = lambda new, old: jax.tree.map(  # noqa: E731
                        lambda a, b: jnp.where(imp, a, b), new, old)
                    b_params = sel(params, b_params)
                    b_opt = sel(opt_state, b_opt)
                    b_metric = jnp.where(imp, m, b_metric)
                return ((params, opt_state, rng, b_params, b_opt, b_metric),
                        (tr_stats["loss_sum"], va_stats["loss_sum"]))

            init = (params, opt_state, rng, params, opt_state,
                    jnp.float32(-jnp.inf))
            (params, opt_state, *_), (tr_k, va_k) = jax.lax.scan(
                epoch_body, init, (idx_k, valid_k))
            return params, opt_state, tr_k, va_k

        return jax.jit(block, donate_argnums=(0, 1))

    def init_state(mdl, impl=None):
        rng = (jax.random.key(0, impl=impl) if impl
               else jax.random.PRNGKey(0))
        rng, init_rng = jax.random.split(rng)
        sample = {k: v[:2] for k, v in va_arrays.items()}
        params = jax.jit(lambda r, i, m: mdl.init(
            r, i, m, q_token_id=bundle.q_token_id, deterministic=True))(
            init_rng, sample["ids"], sample["mask"])["params"]
        return params, tx.init(params), rng

    def time_block(blk, mdl, reps, impl=None):
        params, opt_state, rng = init_state(mdl, impl)
        best = float("inf")
        for i in range(reps + 1):  # +1: compile/warm-up block, discarded
            rng, blk_rng = jax.random.split(rng)
            t0 = time.perf_counter()
            params, opt_state, tr_k, va_k = blk(params, opt_state,
                                                idx_k, valid_k, blk_rng)
            # fetch closes the timing: tr_k/va_k stack one scalar per epoch
            float(np.asarray(tr_k).sum() + np.asarray(va_k).sum())
            dt = time.perf_counter() - t0
            if i > 0:
                best = min(best, dt)
        return best

    model_nodrop = build_setup(dropout=0.0)[2]
    variants = [
        ("full", dict(), model, None),
        ("train_only", dict(do_eval=False, do_sel=False), model, None),
        ("eval_only", dict(do_train=False, do_sel=False), model, None),
        ("sel_only", dict(do_train=False, do_eval=False), model, None),
        ("gather_only", dict(do_train=False, do_eval=False, do_sel=False,
                             gather_only=True), model, None),
        ("nodrop_full", dict(), model_nodrop, None),
        ("rbg_full", dict(), model, "rbg"),
        # inside-the-train-step decomposition
        ("train_nodrop", dict(do_eval=False, do_sel=False),
         model_nodrop, None),
        ("train_fwd_only", dict(do_eval=False, do_sel=False, fwd_only=True),
         model, None),
        ("train_no_update", dict(do_eval=False, do_sel=False,
                                 no_update=True), model, None),
    ]
    rows = []
    for name, flags, mdl, impl in variants:
        blk = make_block(mdl, **flags)
        dt = time_block(blk, mdl, args.reps, impl)
        row = {"variant": name, "block_s": round(dt, 4),
               "s_per_epoch": round(dt / K, 5)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"backend": __import__("jax").default_backend(),
           "config": "ibtt-cycle (configs/ibtt_graph_token.yaml)",
           "k": K, "reps": args.reps,
           "shapes": {"train_rows": int(n_train), "train_nb": int(nb),
                      "train_bucket": int(tr_arrays["ids"].shape[1]),
                      "eval_rows": int(n_eval), "eval_nb": int(eval_nb),
                      "eval_bucket": int(va_arrays["ids"].shape[1])},
           "note": "per-epoch seconds by block variant; timing by host "
                   "fetch of per-epoch stats (dependent on every epoch). "
                   "full ~= train_only + eval_only + sel_only when the "
                   "attribution is additive. r4 conclusion: the r3 floor "
                   "suspects (eval pass, best-epoch selection, batch "
                   "gathers, optimizer) are each <=1 ms/epoch; 91% of the "
                   "block is the fwd+bwd train math itself, with "
                   "attention-prob dropout 31% of it, and the per-batch "
                   "cost matches the attention microbench's own "
                   "near-roofline numbers (FLASH_AB.json ibtt-sp row) — "
                   "the residual is attention+mask HBM bandwidth at "
                   "H=4/D=4, not fusable scheduling overhead.",
           "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
