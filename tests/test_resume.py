"""Checkpoint resume: training continues from the saved epoch and the
restored params are treated as current-best."""

import tempfile

from glearning_benchmark_tpu.train.trainer import train


def _cfg(root, out_dir, epochs, resume=False):
    return {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 20,
                    "max_len": 600, "max_vocab": 600, "generate_num_graphs": 20},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
                  "dropout": 0.1, "max_pos": 600},
        "train": {"batch_size": 16, "epochs": epochs, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0, "resume": resume},
        "output": {"out_dir": out_dir, "run_name": "r"},
        "wandb": {"use": False},
    }


def test_resume_continues(tmp_path):
    root = tempfile.mkdtemp()
    out = str(tmp_path)
    res1 = train(_cfg(root, out, epochs=3), "ibtt", verbose=False)
    assert len(res1.history) == 3
    res2 = train(_cfg(root, out, epochs=6, resume=True), "ibtt", verbose=False)
    # resumes after the saved BEST epoch (only best checkpoints exist)
    assert len(res2.history) < 6
    assert res2.history[0]["epoch"] >= 2
    # best never regresses across the resume
    assert res2.best_val >= res1.best_val - 1e-9


def test_checkpoint_contains_opt_state(tmp_path):
    root = tempfile.mkdtemp()
    out = str(tmp_path)
    train(_cfg(root, out, epochs=3), "ibtt", verbose=False)
    from glearning_benchmark_tpu.train.checkpoint import load_checkpoint
    ckpt = load_checkpoint(f"{out}/best_r")
    assert ckpt is not None and ckpt.get("opt_state")
    # AdamW moments present: more than just the count scalar
    assert len(ckpt["opt_state"]) > 2


def test_block_dispatch_best_epoch_is_exact(tmp_path):
    """With epochs_per_dispatch>1 the saved checkpoint must hold the TRUE
    best-epoch params (device-carried through the scan), i.e. (a) the saved
    epoch is the first argbest of the logged val metric and (b) re-evaluating
    the saved params reproduces best_val."""
    import numpy as np

    from glearning_benchmark_tpu.train.checkpoint import load_checkpoint
    from glearning_benchmark_tpu.train.trainer import (
        _epoch_metrics,
        build_dataset,
        build_model,
        make_batches,
        make_epoch_fns,
    )

    root = tempfile.mkdtemp()
    out = str(tmp_path)
    cfg = _cfg(root, out, epochs=8)
    cfg["train"]["epochs_per_dispatch"] = 4
    res = train(cfg, "ibtt", verbose=False)
    ckpt = load_checkpoint(f"{out}/best_r")
    assert ckpt is not None

    accs = [h["val/acc"] for h in res.history]
    first_best = int(np.argmax(accs)) + 1  # epochs are 1-based
    assert ckpt["epoch"] == first_best
    assert abs(ckpt["best_val"] - max(accs)) < 1e-9

    # re-evaluate the saved params on the val split
    import jax
    import jax.numpy as jnp
    import optax

    bundle = build_dataset("ibtt", cfg["dataset"], seed=0)
    model = build_model("ibtt", cfg, bundle)
    tx = optax.adamw(1e-3)
    _, eval_ep, _ = make_epoch_fns(model, bundle, tx, bundle.task, bundle.num_classes)
    vidx, vvalid = make_batches(bundle.n("val"), cfg["train"]["batch_size"], None)
    arrays = {k: jnp.asarray(v) for k, v in bundle.splits["val"].items()}
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    stats = eval_ep(params, None, arrays, jnp.asarray(vidx), jnp.asarray(vvalid))
    m = _epoch_metrics(stats, bundle.task, bundle.num_classes)
    assert abs(m["accuracy"] - ckpt["best_val"]) < 1e-6


def test_eval_only_scores_checkpoint(tmp_path):
    """epochs=0 + resume (the CLI --eval-only): no training, checkpoint
    loaded, val + test scored; test metrics reproduce a fresh evaluation."""
    root = tempfile.mkdtemp()
    out = str(tmp_path)
    res1 = train(_cfg(root, out, epochs=3), "ibtt", verbose=False)
    cfg = _cfg(root, out, epochs=0, resume=True)
    res2 = train(cfg, "ibtt", verbose=False)
    assert len(res2.history) == 0          # nothing trained
    assert res2.best_val == res1.best_val  # checkpoint's val metric restored
    for k, v in res1.test_metrics.items():
        if isinstance(v, float):
            assert abs(res2.test_metrics[k] - v) < 1e-6, k


def test_eval_only_explicit_checkpoint_path(tmp_path):
    """train.resume_path (CLI --checkpoint) scores an arbitrary checkpoint
    file, independent of out_dir/run_name."""
    import os
    import shutil

    root = tempfile.mkdtemp()
    out = str(tmp_path / "a")
    train(_cfg(root, out, epochs=2), "ibtt", verbose=False)
    # checkpoints are a <stem>.npz + <stem>.json pair; move both, address by
    # the .npz filename (load_checkpoint accepts stem or .npz)
    shutil.move(os.path.join(out, "best_r.npz"), str(tmp_path / "elsewhere.npz"))
    shutil.move(os.path.join(out, "best_r.json"), str(tmp_path / "elsewhere.json"))
    cfg = _cfg(root, str(tmp_path / "b"), epochs=0, resume=True)
    cfg["train"]["resume_path"] = str(tmp_path / "elsewhere.npz")
    res = train(cfg, "ibtt", verbose=False)
    assert res.best_val > 0


def test_bf16_mu_checkpoint_roundtrip_and_cross_dtype_resume(tmp_path):
    """r5: AdamW mu defaults to bf16. (a) np.savez degrades ml_dtypes
    extension dtypes to raw void — the checkpoint layer must round-trip
    bf16 opt_state bit-exactly (ext_dtypes meta + uint view); (b) a
    checkpoint written under f32 mu must resume cleanly under the bf16
    default (template-dtype cast on restore) and vice versa."""
    import numpy as np
    import jax.numpy as jnp

    from glearning_benchmark_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint)

    # (a) exact bf16 round trip through the npz fallback format
    mu = jnp.arange(7, dtype=jnp.bfloat16) * 0.25
    save_checkpoint(str(tmp_path / "ck"),
                    {"params": {"w": jnp.ones((2,), jnp.float32)},
                     "opt_state": {"mu": {"w": mu}}, "epoch": 0,
                     "best_val": 0.0})
    r = load_checkpoint(str(tmp_path / "ck"))
    got = r["opt_state"]["mu"]["w"]
    assert got.dtype == jnp.bfloat16
    assert (np.asarray(got, np.float32) == np.asarray(mu, np.float32)).all()

    # (b) f32-mu run -> checkpoint -> resume under the bf16-mu default
    root = tempfile.mkdtemp()
    out = str(tmp_path / "xdtype")
    cfg = _cfg(root, out, epochs=3)
    cfg["train"]["mu_dtype"] = "float32"
    res1 = train(cfg, "ibtt", verbose=False)
    cfg2 = _cfg(root, out, epochs=6, resume=True)  # default mu: bfloat16
    res2 = train(cfg2, "ibtt", verbose=False)
    assert res2.best_val >= res1.best_val - 1e-9
    assert len(res2.history) < 6  # actually resumed, not restarted
