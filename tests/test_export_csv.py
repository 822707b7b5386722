"""CSV-export parity: tools/export_csv.py regenerates the reference's
figures_data artifact family — W&B-export CSVs whose column schema
(reference figures/README.md:139-153) is consumed by the reference's own
``parse_column_name`` (reference figures/plot_figures.py:71). The test
trains a tiny real run, exports it, and feeds every column through the
ACTUAL reference parser."""

import csv
import os
import sys

import pytest

REF = "/root/reference"
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """One tiny real ibtt run so the export reads the trainer's actual
    on-disk format (metrics JSONL + best_<run>.json checkpoint pair)."""
    from glearning_benchmark_tpu.train.trainer import train

    root = tmp_path_factory.mktemp("data")
    out = tmp_path_factory.mktemp("out") / "runs_ibtt"
    cfg = {"dataset": {"graph_token_root": str(root), "task": "cycle_check",
                       "train_algorithms": ["ba"], "test_algorithm": "sfn",
                       "use_split_tasks_dirs": True, "num_graphs": 12,
                       "max_len": 600, "max_vocab": 600,
                       "generate_num_graphs": 12},
           "model": {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
                     "dropout": 0.1, "max_pos": 600},
           "train": {"batch_size": 8, "epochs": 3, "lr": 1e-3,
                     "weight_decay": 1e-4, "seed": 0},
           "output": {"out_dir": str(out), "run_name": "csvexp"},
           "wandb": {"use": False}}
    train(cfg, "ibtt", verbose=False)
    return str(out)


@pytest.fixture(scope="module")
def exported(run_dir, tmp_path_factory):
    sys.path.insert(0, TOOLS)
    from export_csv import export_all

    out_dir = str(tmp_path_factory.mktemp("figures_data"))
    written = export_all([run_dir], out_dir)
    assert written, "export produced no CSVs"
    return written


def _read(path):
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def test_export_files_and_schema(exported):
    names = {os.path.basename(p) for p in exported}
    # classification run -> acc/f1/loss families, like the reference's
    # cycle_check_acc.csv (SURVEY §6 sources)
    assert {"cycle_check_acc.csv", "cycle_check_f1.csv",
            "cycle_check_loss.csv"} <= names
    header, rows = _read([p for p in exported if p.endswith("_acc.csv")][0])
    assert header[0] == "Step"
    # every data column carries its __MIN/__MAX error-band pair
    data_cols = [c for c in header[1:] if not c.endswith(("__MIN", "__MAX"))]
    for c in data_cols:
        assert f"{c}__MIN" in header and f"{c}__MAX" in header
    # steps are 1-based ints and rows align with the header
    assert rows and rows[0][0] == "1"
    assert all(len(r) == len(header) for r in rows)


def _ref_plot_figures():
    import matplotlib
    matplotlib.use("Agg")
    figdir = os.path.join(REF, "figures")
    if figdir not in sys.path:
        sys.path.insert(0, figdir)
    import plot_figures as ref_pf
    return ref_pf


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_reference_parser_accepts_columns(exported):
    ref_pf = _ref_plot_figures()

    header, _ = _read([p for p in exported if p.endswith("_acc.csv")][0])
    data_cols = [c for c in header[1:] if not c.endswith(("__MIN", "__MAX"))]
    assert data_cols
    seen_splits = set()
    for col in data_cols:
        info = ref_pf.parse_column_name(col)
        assert info is not None, col
        assert info["model"] == "ibtt"
        assert info["dataset"] == "ba"
        assert info["metric"] == "acc"
        # the reference parser's \w+ stops at the first hyphen of
        # 'cycle-check' — identical to its behavior on its own CSVs
        assert info["task"] == "cycle"
        seen_splits.add(info["split"])
    assert seen_splits == {"train", "val"}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_reference_create_plot_renders(exported, tmp_path):
    """The reference's full plotting entry point (plot_figures.py:199
    create_plot) renders a figure from our export unchanged."""
    from pathlib import Path

    ref_pf = _ref_plot_figures()
    csv_path = Path([p for p in exported if p.endswith("_acc.csv")][0])
    ref_pf.create_plot(csv_path, tmp_path)
    out = tmp_path / f"{csv_path.stem}.png"
    assert out.is_file() and out.stat().st_size > 0


def test_values_round_trip(run_dir, exported):
    import json

    mpath = [os.path.join(run_dir, f) for f in os.listdir(run_dir)
             if f.endswith("_metrics.jsonl")][0]
    hist = [json.loads(line) for line in open(mpath)]
    header, rows = _read([p for p in exported if p.endswith("_acc.csv")][0])
    val_col = next(i for i, c in enumerate(header)
                   if c.endswith("- val/acc"))
    by_step = {int(r[0]): float(r[val_col]) for r in rows if r[val_col]}
    for h in hist:
        if "val/acc" in h:
            assert by_step[int(h["epoch"])] == pytest.approx(h["val/acc"])
