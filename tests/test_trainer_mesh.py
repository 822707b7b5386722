"""End-to-end data-parallel training over the 8-device virtual CPU mesh:
the batch axis shards over 'data' and training still converges."""

import tempfile

import jax

from glearning_benchmark_tpu.parallel import make_mesh
from glearning_benchmark_tpu.train.trainer import train


def test_train_dp_mesh():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    root = tempfile.mkdtemp()
    cfg = {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba", "sbm"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 30,
                    "max_len": 600, "max_vocab": 600, "generate_num_graphs": 30},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                  "dropout": 0.1, "max_pos": 600},
        # batch 16 over 8 devices -> 2 examples per device
        "train": {"batch_size": 16, "epochs": 3, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": tempfile.mkdtemp(), "run_name": "dp"},
        "wandb": {"use": False},
    }
    res = train(cfg, "ibtt", verbose=False, mesh=mesh)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    assert 0.0 <= res.best_val <= 1.0
