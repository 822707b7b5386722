"""DP and DPxTP coverage for the graph-native families (mpnn, gps): the
trainer's mesh layout is model-agnostic — dense graph batches shard their
batch axis over 'data', and the TP rule shards GIN/GPS Dense kernels over
'model' — so both families must train and match DP trajectories under TP
(SURVEY backlog: TP for the GNN families' wide hidden layers).
"""

import tempfile

import numpy as np

from glearning_benchmark_tpu.parallel import make_mesh
from glearning_benchmark_tpu.train.trainer import train


def _cfg(root, model_key, model_axis, out):
    model = {"hidden_dim": 32, "num_layers": 2, "dropout": 0.0,
             "pooling": "mean", "compute_dtype": "float32"}
    if model_key == "ggps":
        model.update({"nhead": 4})
    return {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 24,
                    "generate_num_graphs": 24},
        "model": model,
        "parallel": {"model_axis": model_axis},
        "train": {"batch_size": 8, "epochs": 2, "lr": 1e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": out, "run_name": f"{model_key}{model_axis}"},
        "wandb": {"use": False},
    }


def _dp_vs_dptp(model_key):
    root = tempfile.mkdtemp()
    r_dp = train(_cfg(root, model_key, 1, tempfile.mkdtemp()), model_key,
                 verbose=False, mesh=make_mesh(model_axis=1))
    r_tp = train(_cfg(root, model_key, 2, tempfile.mkdtemp()), model_key,
                 verbose=False, mesh=make_mesh(model_axis=2))
    l_dp = [h["train/loss"] for h in r_dp.history]
    l_tp = [h["train/loss"] for h in r_tp.history]
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-3)


def test_mpnn_dp_vs_dptp_equivalence():
    _dp_vs_dptp("mpnn")


def test_gps_dp_vs_dptp_equivalence():
    _dp_vs_dptp("ggps")
