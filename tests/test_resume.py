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
