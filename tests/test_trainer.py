"""End-to-end trainer tests: every model family trains a few epochs on a
tiny corpus, loss decreases, checkpoints round-trip."""

import numpy as np
import pytest

from glearning_benchmark_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from glearning_benchmark_tpu.train.trainer import train


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("gt"))


def _config(root, out_dir, task="cycle_check", model=None, epochs=3, **ds_extra):
    ds = {"graph_token_root": root, "task": task,
          "train_algorithms": ["ba", "sbm"], "test_algorithm": "sfn",
          "use_split_tasks_dirs": True, "num_graphs": 30,
          "max_len": 600, "max_vocab": 600, "generate_num_graphs": 30}
    ds.update(ds_extra)
    return {
        "dataset": ds,
        "model": model or {"d_model": 16, "nhead": 4, "nlayers": 2,
                           "d_ff": 64, "dropout": 0.1, "max_pos": 600},
        "train": {"batch_size": 16, "epochs": epochs, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "gt": {"layers": 2, "n_heads": 4, "dim_hidden": 16,
               "dropout": 0.0, "attn_dropout": 0.1},
        "output": {"out_dir": out_dir, "run_name": "t"},
        "wandb": {"use": False},
    }


@pytest.mark.parametrize("model_name", ["ibtt", "agtt", "mpnn", "ggps"])
def test_train_cycle_check(model_name, corpus_root, tmp_path):
    cfg = _config(corpus_root, str(tmp_path))
    res = train(cfg, model_name, verbose=False)
    losses = [h["train/loss"] for h in res.history]
    assert losses[-1] < losses[0], f"{model_name} loss did not decrease: {losses}"
    assert 0.0 <= res.best_val <= 1.0
    assert "accuracy" in res.test_metrics


def test_train_shortest_path_ibtt(corpus_root, tmp_path):
    cfg = _config(corpus_root, str(tmp_path), task="shortest_path",
                  num_pairs_per_graph=5)
    res = train(cfg, "ibtt", verbose=False)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    cm = res.test_metrics["confusion_matrix"]
    assert cm.shape[0] >= 2  # multi-class


def test_train_shortest_path_mpnn_query_encoding(corpus_root, tmp_path):
    cfg = _config(corpus_root, str(tmp_path), task="shortest_path",
                  num_pairs_per_graph=5,
                  model={"hidden_dim": 32, "num_layers": 3, "dropout": 0.0,
                         "pooling": "mean"})
    res = train(cfg, "mpnn", verbose=False)
    # query-encoding transform gives in_dim 3 (const + src + tgt flags)
    assert res.bundle.in_dim == 3
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]


def test_train_zinc_ibtt(tmp_path):
    cfg = {
        "dataset": {"task": "zinc", "zinc_root": str(tmp_path / "z"),
                    "subset": True, "max_len": 512, "max_vocab": 2000},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                  "dropout": 0.1, "max_pos": 512},
        "train": {"batch_size": 16, "epochs": 2, "lr": 1e-3,
                  "weight_decay": 1e-5, "seed": 0},
        "output": {"out_dir": str(tmp_path), "run_name": "z"},
        "wandb": {"use": False},
    }
    res = train(cfg, "ibtt", limit=64, verbose=False)
    assert "mae" in res.test_metrics
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]


def test_train_zinc_agtt_and_mpnn(tmp_path):
    base = {
        "dataset": {"task": "zinc", "zinc_root": str(tmp_path / "z"),
                    "subset": True, "max_len": 512},
        "train": {"batch_size": 16, "epochs": 2, "lr": 1e-3,
                  "weight_decay": 1e-5, "seed": 0},
        "gt": {"layers": 2, "n_heads": 2, "dim_hidden": 16},
        "output": {"out_dir": str(tmp_path), "run_name": "z2"},
        "wandb": {"use": False},
    }
    for name, mcfg in [("agtt", {"d_model": 16, "nhead": 2, "nlayers": 1,
                                 "d_ff": 32, "dropout": 0.1, "max_pos": 512}),
                       ("mpnn", {"hidden_dim": 16, "num_layers": 2,
                                 "dropout": 0.0, "pooling": "mean"})]:
        cfg = dict(base, model=mcfg)
        res = train(cfg, name, limit=48, verbose=False)
        assert "mae" in res.test_metrics, name


def test_train_prng_impl_rbg(corpus_root, tmp_path):
    """`train.prng_impl: rbg` (typed jax.random.key instead of PRNGKey raw
    arrays) must flow through init, the scanned epoch loop, checkpointing,
    and the final test pass without a typed-key incompatibility (ADVICE r3:
    previously unexercised outside the TPU)."""
    cfg = _config(corpus_root, str(tmp_path), epochs=2)
    cfg["train"]["prng_impl"] = "rbg"
    res = train(cfg, "ibtt", verbose=False)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    assert "accuracy" in res.test_metrics
    # the best-epoch checkpoint written under a typed-key run must restore
    ckpt = load_checkpoint(str(tmp_path / "best_t"))
    assert ckpt is not None and np.isfinite(ckpt["best_val"])


def test_train_mu_dtype_bf16(corpus_root, tmp_path):
    """`train.mu_dtype: bfloat16` (r5: +2.5 MFU points at d2048 from
    halved AdamW mu traffic) must train, keep the mu state in bf16, and
    checkpoint/restore through the same path as f32 state."""
    cfg = _config(corpus_root, str(tmp_path), epochs=2)
    cfg["train"]["mu_dtype"] = "bfloat16"
    res = train(cfg, "ibtt", verbose=False)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    ckpt = load_checkpoint(str(tmp_path / "best_t"))
    assert ckpt is not None and np.isfinite(ckpt["best_val"])


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"dense": {"kernel": np.ones((3, 2)), "bias": np.zeros(2)}},
        "batch_stats": None,
        "epoch": 7,
        "best_val": 0.9,
        "config": {"a": 1},
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    assert loaded["epoch"] == 7 and loaded["best_val"] == 0.9
    np.testing.assert_array_equal(loaded["params"]["dense"]["kernel"],
                                  state["params"]["dense"]["kernel"])
    assert load_checkpoint(str(tmp_path / "missing")) is None


@pytest.mark.parametrize("model_name", ["mpnn", "ggps"])
def test_train_zinc_edge_features(model_name, tmp_path):
    """GINE (model.edge_features) trains end-to-end on the ZINC stand-in:
    the bond-type adjacency flows dataset -> gather -> init -> apply."""
    cfg = _config(str(tmp_path / "gt"), str(tmp_path), task="zinc")
    cfg["dataset"] = {"task": "zinc", "zinc_root": str(tmp_path / "zinc"),
                      "subset": True}
    cfg["model"] = {"hidden_dim": 16, "num_layers": 2, "dropout": 0.0,
                    "edge_features": True}
    res = train(cfg, model_name, verbose=False, limit=48)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    assert np.isfinite(res.best_val)


def test_wandb_gradient_and_param_histograms(corpus_root, tmp_path, monkeypatch):
    """The wandb.watch(log="all") parity path: with wandb active the engine
    logs per-layer parameter AND gradient histograms at dispatch-block
    boundaries (reference train_ibtt.py:450-453). Exercised via a stub wandb
    module so the real call site (grad probe shapes included) runs."""
    import sys
    import types

    logged = []

    class _Hist:
        def __init__(self, arr):
            self.arr = np.asarray(arr)
            assert np.all(np.isfinite(self.arr))

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: None
    fake.log = lambda d: logged.append(d)
    fake.watch = lambda *a, **kw: None
    fake.finish = lambda: None
    fake.Histogram = _Hist
    fake.Image = lambda *a, **kw: None
    fake.Table = lambda *a, **kw: None
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cfg = _config(corpus_root, str(tmp_path), epochs=2)
    cfg["wandb"] = {"use": True, "project": "t"}
    train(cfg, "ibtt", verbose=False)

    param_keys = {k for d in logged for k in d if k.startswith("parameters/")}
    grad_keys = {k for d in logged for k in d if k.startswith("gradients/")}
    assert param_keys, "no parameter histograms logged"
    assert grad_keys, "no gradient histograms logged"
    # per-layer parity: every parameter leaf has a matching gradient leaf
    assert {k.split("/", 1)[1] for k in param_keys} == \
        {k.split("/", 1)[1] for k in grad_keys}
    # epoch-log schema carries both memory keys (device_mb + reference alias)
    epoch_rows = [d for d in logged if "memory/device_mb" in d]
    assert epoch_rows and all(
        d["memory/gpu_allocated_mb"] == d["memory/device_mb"]
        for d in epoch_rows)
