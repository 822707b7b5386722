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


def test_train_dp_tp_mesh():
    """Production trainer with parallel.model_axis=2: a (4 data x 2 model)
    mesh, params feature-sharded over 'model', training still converges."""
    mesh = make_mesh(model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    root = tempfile.mkdtemp()
    cfg = {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba", "sbm"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 30,
                    "max_len": 600, "max_vocab": 600, "generate_num_graphs": 30},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                  "dropout": 0.1, "max_pos": 600},
        "parallel": {"model_axis": 2},
        "train": {"batch_size": 16, "epochs": 3, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": tempfile.mkdtemp(), "run_name": "dptp"},
        "wandb": {"use": False},
    }
    res = train(cfg, "ibtt", verbose=False, mesh=mesh)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    assert 0.0 <= res.best_val <= 1.0


def test_shard_params_rule():
    """TP rule: embedding/kernel feature dims shard over 'model' (when
    divisible), biases and odd-width kernels stay replicated."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from glearning_benchmark_tpu.parallel import shard_params

    mesh = make_mesh(model_axis=2)
    tree = {"emb": {"embedding": jnp.zeros((11, 16))},
            "dense": {"kernel": jnp.zeros((16, 64)), "bias": jnp.zeros((64,))},
            "odd": {"kernel": jnp.zeros((16, 7))}}
    out = shard_params(mesh, tree)
    assert out["emb"]["embedding"].sharding.spec == P(None, "model")
    assert out["dense"]["kernel"].sharding.spec == P(None, "model")
    assert out["dense"]["bias"].sharding.spec == P()
    assert out["odd"]["kernel"].sharding.spec == P()


def test_dp_vs_dptp_equivalence():
    """TP is a layout, not a math change: the same seed/config trained on a
    (8 data) mesh and a (4 data x 2 model) mesh must produce the same loss
    trajectory up to float reassociation across the different collectives."""
    import numpy as np

    root = tempfile.mkdtemp()
    def cfg(out, model_axis):
        return {
            "dataset": {"graph_token_root": root, "task": "cycle_check",
                        "train_algorithms": ["ba"], "test_algorithm": "sfn",
                        "use_split_tasks_dirs": True, "num_graphs": 24,
                        "max_len": 600, "max_vocab": 600,
                        "generate_num_graphs": 24},
            "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                      "dropout": 0.0, "max_pos": 600,
                      "compute_dtype": "float32"},
            "parallel": {"model_axis": model_axis},
            "train": {"batch_size": 8, "epochs": 2, "lr": 1e-3,
                      "weight_decay": 1e-4, "seed": 0},
            "output": {"out_dir": out, "run_name": f"eq{model_axis}"},
            "wandb": {"use": False},
        }

    r_dp = train(cfg(tempfile.mkdtemp(), 1), "ibtt", verbose=False,
                 mesh=make_mesh(model_axis=1))
    r_tp = train(cfg(tempfile.mkdtemp(), 2), "ibtt", verbose=False,
                 mesh=make_mesh(model_axis=2))
    l_dp = [h["train/loss"] for h in r_dp.history]
    l_tp = [h["train/loss"] for h in r_tp.history]
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-3)
