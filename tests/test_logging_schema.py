"""Lock the observable logging schema: per-epoch history dicts carry the
reference's W&B keys (SURVEY §5 — the keys are part of the observable
surface)."""

import tempfile

from glearning_benchmark_tpu.train.trainer import train

COMMON = {"epoch", "train/loss", "val/loss", "lr", "time/epoch_duration",
          "throughput/graphs_per_sec", "memory/device_mb",
          "memory/gpu_allocated_mb",  # reference key name (train_ibtt.py:514)
          "efficiency/time_per_metric_unit"}
CLS = {"train/acc", "val/acc", "train/precision", "val/precision",
       "train/recall", "val/recall", "train/f1", "val/f1"}
SP_EXTRA = {"train/mse", "train/mae", "val/mse", "val/mae"}
REG = {"train/mae", "train/mse", "train/rmse", "val/mae", "val/mse", "val/rmse"}


def _run(task, **ds_extra):
    root = tempfile.mkdtemp()
    ds = {"graph_token_root": root, "task": task,
          "train_algorithms": ["ba"], "test_algorithm": "sfn",
          "use_split_tasks_dirs": True, "num_graphs": 12,
          "max_len": 600, "max_vocab": 600, "generate_num_graphs": 12}
    ds.update(ds_extra)
    cfg = {"dataset": ds,
           "model": {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
                     "dropout": 0.1, "max_pos": 600},
           "train": {"batch_size": 8, "epochs": 2, "lr": 1e-3,
                     "weight_decay": 1e-4, "seed": 0},
           "output": {"out_dir": tempfile.mkdtemp(), "run_name": "schema"},
           "wandb": {"use": False}}
    return train(cfg, "ibtt", verbose=False)


def test_classification_keys():
    res = _run("cycle_check")
    keys = set(res.history[0])
    assert COMMON <= keys
    assert CLS <= keys


def test_shortest_path_keys():
    res = _run("shortest_path", num_pairs_per_graph=4)
    keys = set(res.history[0])
    assert COMMON <= keys and CLS <= keys and SP_EXTRA <= keys


def test_zinc_keys(tmp_path):
    cfg = {"dataset": {"task": "zinc", "zinc_root": str(tmp_path),
                       "subset": True, "max_len": 512, "max_vocab": 2000},
           "model": {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
                     "dropout": 0.1, "max_pos": 512},
           "train": {"batch_size": 16, "epochs": 2, "lr": 1e-3,
                     "weight_decay": 1e-5, "seed": 0},
           "output": {"out_dir": str(tmp_path), "run_name": "zs"},
           "wandb": {"use": False}}
    res = train(cfg, "ibtt", limit=48, verbose=False)
    keys = set(res.history[0])
    assert COMMON <= keys and REG <= keys
    assert {"mae", "mse", "rmse", "loss"} <= set(res.test_metrics)
