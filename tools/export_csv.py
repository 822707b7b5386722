#!/usr/bin/env python
"""Export run histories as reference-schema W&B CSV files.

The reference's published numbers live in ``figures/figures_data/*.csv`` —
W&B exports whose column schema is part of the observable surface
(reference figures/README.md:139-153, consumed by
figures/plot_figures.py:71 ``parse_column_name``):

    "Step","{arch}-{model}-{task} ({dataset}) - {split}/{metric}", ...

with optional ``__MIN``/``__MAX`` error-band columns and empty cells where a
run has no value at that step. This tool regenerates that artifact family
from our JSONL run logs so the reference's own plotting pipeline (and any
downstream consumer of its CSVs) works unchanged on this framework's runs.

Output files mirror the reference's figures_data naming:
``{task}_{metric}.csv`` (e.g. cycle_check_acc.csv, zinc_loss.csv).

Usage:
    python tools/export_csv.py [--run-dirs runs_ibtt runs_agtt ...]
                               [--out figures_data]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
from typing import Dict, List, Optional

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_results import load_jsonl  # noqa: E402

DEFAULT_RUN_DIRS = ("runs_ibtt", "runs_agtt", "runs_mpnn", "runs_gps")

# metric key per CSV family; the reference publishes acc / f1 / loss CSVs
# for the synthetic tasks and loss (L1) for zinc (SURVEY §6 table).
METRICS = ("acc", "f1", "loss", "mae")


def arch_string(model: str, cfg: dict) -> str:
    """Reference arch prefix: '4l4h32' (transformers/GPS), '5l64' (MPNN) —
    figures/README.md column examples and figures_data headers."""
    m = cfg.get("model", {}) or {}
    if model == "gps":
        gt = cfg.get("gt", {}) or {}
        layers = gt.get("layers", m.get("nlayers", "?"))
        heads = gt.get("n_heads", m.get("nhead", "?"))
        dim = gt.get("dim_hidden", m.get("d_model", "?"))
        return f"{layers}l{heads}h{dim}"
    if model == "mpnn":
        return f"{m.get('num_layers', '?')}l{m.get('hidden_dim', '?')}"
    return f"{m.get('nlayers', '?')}l{m.get('nhead', '?')}h{m.get('d_model', '?')}"


def _model_from_dir(d: str) -> Optional[str]:
    base = os.path.basename(os.path.normpath(d)).lower()
    for m in ("mpnn", "ggps", "gps", "ibtt", "agtt"):
        if m in base:
            return "gps" if m == "ggps" else m
    return None


def discover(run_dirs) -> List[dict]:
    """Collect runs with their configs: {name, model, task, dataset, arch,
    history}."""
    runs = []
    for d in run_dirs:
        for mpath in sorted(glob.glob(os.path.join(d, "*_metrics.jsonl"))):
            name = os.path.basename(mpath)[: -len("_metrics.jsonl")]
            cpath = os.path.join(d, f"best_{name}.json")
            cfg: dict = {}
            if os.path.isfile(cpath):
                try:
                    with open(cpath) as f:
                        cfg = json.load(f).get("config", {}) or {}
                except Exception:
                    cfg = {}
            ds = cfg.get("dataset", cfg.get("data", {})) or {}
            if ds.get("zinc_target_weights"):
                # component-probe targets (zinc_target_probe.py) are
                # different regression problems — keep them out of the
                # campaign CSV exports
                continue
            task = ds.get("task") or "?"
            dataset = "+".join(ds.get("train_algorithms", []) or [])
            model = _model_from_dir((cfg.get("output") or {}).get("out_dir", d)) \
                or _model_from_dir(d) or "?"
            history = [r for r in load_jsonl(mpath) if "epoch" in r]
            if history:
                runs.append({"name": name, "model": model, "task": task,
                             "dataset": dataset, "arch": arch_string(model, cfg),
                             "difficulty": ds.get("difficulty", "default"),
                             "history": history})
    return runs


def column_name(run: dict, split: str, metric: str) -> str:
    """'{arch}-{model}-{task} ({dataset}) - {split}/{metric}' — the task is
    hyphenated like the reference exports ('cycle-check')."""
    task = run["task"].replace("_", "-")
    return (f"{run['arch']}-{run['model']}-{task} ({run['dataset']})"
            f" - {split}/{metric}")


def export_task_metric(runs: List[dict], task: str, metric: str,
                       out_path: str, error_bands: bool = True) -> bool:
    """Write one reference-schema CSV for (task, metric). Returns False when
    no run logs that metric."""
    cols: List[str] = []
    series: Dict[str, Dict[int, float]] = {}
    for run in runs:
        if run["task"] != task:
            continue
        for split in ("train", "val"):
            key = f"{split}/{metric}"
            # trainer epochs are already 1-based (trainer.py start_epoch=1),
            # matching the reference exports' 1-based "Step"
            vals = {int(r["epoch"]): float(r[key])
                    for r in run["history"] if key in r}
            if not vals:
                continue
            col = column_name(run, split, metric)
            # seed repeats of one config collide on the column name; W&B
            # disambiguates by run name — suffix like it does rather than
            # silently double-writing one run and dropping the other. Seed
            # repeats usually share run['name'] too, so add a counter to
            # keep the suffixed key unique as well.
            if col in series:
                base, k = col, 2
                col = f"{base} [{run['name']}]"
                while col in series:
                    col = f"{base} [{run['name']}#{k}]"
                    k += 1
            cols.append(col)
            series[col] = vals
    if not cols:
        return False
    steps = sorted({s for v in series.values() for s in v})
    header = ["Step"]
    for c in cols:
        header.append(c)
        if error_bands:
            header += [f"{c}__MIN", f"{c}__MAX"]
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL)
        w.writerow(header)
        for s in steps:
            row: List[object] = [s]
            for c in cols:
                v = series[c].get(s, "")
                # single-run export: MIN == MAX == value (W&B convention)
                row += [v, v, v] if error_bands else [v]
            w.writerow(row)
    return True


def export_all(run_dirs, out_dir: str, error_bands: bool = True,
               difficulty: str = "default") -> List[str]:
    """Export every (task, metric) CSV for runs at the given corpus
    ``difficulty`` ('all' disables the filter). Campaigns at different
    difficulty presets share run dirs, so an unfiltered export would mix
    e.g. hard-preset er+sbm series into the reference-parity default CSVs
    under the same filenames (ADVICE r4 medium #2) — hard runs export to
    their own directory (run_benchmarks.py -> figures_data_hard)."""
    runs = discover(run_dirs)
    if difficulty != "all":
        runs = [r for r in runs if r["difficulty"] == difficulty]
    if not runs:
        return []
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for task in sorted({r["task"] for r in runs}):
        for metric in METRICS:
            path = os.path.join(out_dir, f"{task}_{metric}.csv")
            if export_task_metric(runs, task, metric, path,
                                  error_bands=error_bands):
                written.append(path)
    return written


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run-dirs", nargs="*", default=list(DEFAULT_RUN_DIRS))
    ap.add_argument("--out", default="figures_data")
    ap.add_argument("--no-error-bands", action="store_true",
                    help="omit the __MIN/__MAX columns")
    ap.add_argument("--difficulty", default="default",
                    help="only export runs at this dataset.difficulty "
                         "('all' disables the filter; default 'default')")
    args = ap.parse_args()
    written = export_all([d for d in args.run_dirs if os.path.isdir(d)],
                         args.out, error_bands=not args.no_error_bands,
                         difficulty=args.difficulty)
    for p in written:
        print(p)
    if not written:
        print("no runs found", file=sys.stderr)


if __name__ == "__main__":
    main()
