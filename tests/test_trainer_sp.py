"""Production trainer with sequence parallelism (parallel.seq_shards):
the ('data','model','seq') mesh rings K/V blocks over the virtual 8-device
CPU mesh and the loss trajectory matches plain DP."""

import tempfile

import numpy as np
import pytest

from glearning_benchmark_tpu.parallel import make_mesh
from glearning_benchmark_tpu.train.trainer import train


def _cfg(root, out, seq_shards, pack=False, dropout=0.0):
    return {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 24,
                    "max_len": 600, "max_vocab": 600,
                    "generate_num_graphs": 24, "pack": pack},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                  "dropout": dropout, "max_pos": 600,
                  "compute_dtype": "float32"},
        "parallel": {"seq_shards": seq_shards},
        "train": {"batch_size": 8, "epochs": 2, "lr": 1e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": out, "run_name": f"sp{seq_shards}"},
        "wandb": {"use": False},
    }


def test_dp_vs_dpsp_equivalence():
    """SP is a layout, not a math change: same seed/config on a (8 data)
    mesh and a (4 data x 1 model x 2 seq) mesh give the same trajectory up
    to float reassociation in the online softmax."""
    root = tempfile.mkdtemp()
    r_dp = train(_cfg(root, tempfile.mkdtemp(), 1), "ibtt", verbose=False,
                 mesh=make_mesh())
    r_sp = train(_cfg(root, tempfile.mkdtemp(), 2), "ibtt", verbose=False,
                 mesh=make_mesh(seq_shards=2))
    l_dp = [h["train/loss"] for h in r_dp.history]
    l_sp = [h["train/loss"] for h in r_sp.history]
    np.testing.assert_allclose(l_dp, l_sp, rtol=2e-3)
    assert r_sp.history[-1]["train/loss"] < r_sp.history[0]["train/loss"]


def test_sp_with_dropout_trains():
    """Attention-prob dropout rides the ring's own substreams; training
    still converges (stream identity is not the contract)."""
    root = tempfile.mkdtemp()
    r = train(_cfg(root, tempfile.mkdtemp(), 2, dropout=0.1), "ibtt",
              verbose=False, mesh=make_mesh(seq_shards=2))
    assert r.history[-1]["train/loss"] < r.history[0]["train/loss"]


def test_sp_rejects_packed_rows():
    root = tempfile.mkdtemp()
    with pytest.raises(ValueError, match="pack"):
        train(_cfg(root, tempfile.mkdtemp(), 2, pack=True), "ibtt",
              verbose=False, mesh=make_mesh(seq_shards=2))


def test_sp_rejects_graph_models():
    root = tempfile.mkdtemp()
    cfg = _cfg(root, tempfile.mkdtemp(), 2)
    cfg["model"] = {"hidden_dim": 16, "num_layers": 2}
    with pytest.raises(ValueError, match="seq_shards"):
        train(cfg, "mpnn", verbose=False)
