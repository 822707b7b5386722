#!/usr/bin/env python
"""Publication plotting: the reference's three figure families, regenerated
from local artifacts instead of W&B CSV exports.

Reference: figures/plot_figures.py —
  create_plot (:199)                       -> comparison_curves()
  create_label_distribution_plots (:447)   -> label_distribution_plots()
  create_zinc_distribution_plots (:593)    -> zinc_distribution_plots()

Inputs are this framework's own run artifacts: every training run writes
<out_dir>/<run>_metrics.jsonl (reference W&B key schema) and
<out_dir>/best_<run>.json (embedded config -> model/task/train algorithms),
so multi-run multi-model comparison figures need no external export.

    python tools/plot_results.py curves  runs_ibtt runs_agtt runs_mpnn runs_gps --out figures
    python tools/plot_results.py labels  --data-root data/graph-token --out figures
    python tools/plot_results.py zinc    --out figures
    python tools/plot_results.py all     runs_* --out figures

Colors/line styles replicate the reference palette (plot_figures.py:30-68)
so regenerated figures are visually comparable to the published ones.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import Counter, defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

# reference palette (plot_figures.py:30-68)
MODEL_COLORS = {
    "mpnn": "#0173B2", "gps": "#DE8F05", "ggps": "#DE8F05",
    "ibtt": "#029E73", "agtt": "#CC78BC",
}
DATASET_COLORS = {
    ("mpnn", "ba+sbm"): "#0173B2", ("mpnn", "er+sbm+path"): "#56B4E9",
    ("mpnn", "path"): "#004D80",
    ("agtt", "ba+sbm"): "#CC78BC", ("agtt", "path"): "#E56AAD",
    ("agtt", "er"): "#7C3F6D", ("agtt", "er+sbm"): "#9B4F96",
    ("agtt", "er+sbm+path"): "#CC78BC",
    ("gps", "er+sbm+path"): "#DE8F05", ("gps", "ba+sbm"): "#FDB462",
    ("ibtt", "ba+sbm"): "#029E73", ("ibtt", "path"): "#56C2A3",
}
LINE_STYLES = {"train": "-", "val": "--"}


def color_for(model: str, dataset: str) -> str:
    return DATASET_COLORS.get((model.lower(), dataset.lower()),
                              MODEL_COLORS.get(model.lower(), "#888888"))


def smooth_curve(y, window_length=11, polyorder=3):
    """Savitzky-Golay smoothing (plot_figures.py:125-136)."""
    from scipy.signal import savgol_filter

    y = np.asarray(y, dtype=float)
    if len(y) < window_length:
        window_length = len(y) if len(y) % 2 == 1 else len(y) - 1
        if window_length < polyorder + 2:
            return y
    try:
        return savgol_filter(y, window_length, polyorder)
    except Exception:
        return y


# ---------------------------------------------------------------------------
# run discovery: pair each *_metrics.jsonl with its best_*.json config
# ---------------------------------------------------------------------------

def load_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def discover_runs(run_dirs, difficulty="default"):
    """Yield dicts {name, model, task, dataset, history} per completed run.

    ``difficulty`` filters by the run config's dataset.difficulty
    ('all' disables) — hard-preset runs share the same run dirs and would
    otherwise mix into the default-campaign figures (same rationale as
    export_csv's filter, ADVICE r4 medium #2)."""
    runs = []
    for d in run_dirs:
        for mpath in sorted(glob.glob(os.path.join(d, "*_metrics.jsonl"))):
            name = os.path.basename(mpath)[: -len("_metrics.jsonl")]
            cpath = os.path.join(d, f"best_{name}.json")
            model = task = None
            dataset = ""
            run_difficulty = "default"
            if os.path.isfile(cpath):
                try:
                    with open(cpath) as f:
                        cfg = json.load(f).get("config", {})
                    ds = cfg.get("dataset", {})
                    task = ds.get("task")
                    dataset = "+".join(ds.get("train_algorithms", []) or [])
                    run_difficulty = ds.get("difficulty") or "default"
                    if ds.get("zinc_target_weights"):
                        # component-probe targets (zinc_target_probe.py)
                        # are different regression problems — never mix
                        # them into the default zinc figures
                        run_difficulty = "probe"
                    out = cfg.get("output", {})
                    model = _model_from_dir(out.get("out_dir", d))
                except Exception:
                    pass
            if difficulty != "all" and run_difficulty != difficulty:
                continue
            if model is None:
                model = _model_from_dir(d)
            history = [r for r in load_jsonl(mpath) if "epoch" in r]
            if history:
                runs.append({"name": name, "model": model, "task": task or "?",
                             "dataset": dataset, "history": history})
    return runs


def _model_from_dir(d: str) -> str:
    base = os.path.basename(os.path.normpath(d)).lower()
    for m in ("mpnn", "ggps", "gps", "ibtt", "agtt"):
        if m in base:
            return "gps" if m == "ggps" else m
    return base or "?"


# ---------------------------------------------------------------------------
# figure family 1: multi-run comparison curves (create_plot parity)
# ---------------------------------------------------------------------------

METRIC_KEYS = {"acc": ("train/acc", "val/acc", "Accuracy"),
               "loss": ("train/loss", "val/loss", "Loss"),
               "f1": ("train/f1", "val/f1", "F1 Score"),
               "mae": ("train/mae", "val/mae", "MAE")}


def comparison_curves(run_dirs, out_dir, metrics=("acc", "loss", "f1"),
                      smooth_window=11, show_original=True,
                      difficulty="default", prefix=""):
    os.makedirs(out_dir, exist_ok=True)
    runs = discover_runs(run_dirs, difficulty=difficulty)
    by_task = defaultdict(list)
    for r in runs:
        by_task[r["task"]].append(r)

    written = []
    for task, task_runs in sorted(by_task.items()):
        use = metrics if task != "zinc" else ("mae", "loss")
        for metric in use:
            tr_key, va_key, ylabel = METRIC_KEYS[metric]
            fig, ax = plt.subplots(figsize=(10, 6))
            plotted = False
            for r in sorted(task_runs, key=lambda r: (r["model"], r["dataset"])):
                for split, key in (("train", tr_key), ("val", va_key)):
                    xy = [(row["epoch"], row[key]) for row in r["history"]
                          if key in row]
                    if not xy:
                        continue
                    x, y = map(np.asarray, zip(*xy))
                    color = color_for(r["model"], r["dataset"])
                    ls = LINE_STYLES[split]
                    label = f"{r['model'].upper()}" + (
                        f" ({r['dataset'].replace('+', ' + ').upper()})"
                        if r["dataset"] else "") + f" - {split.capitalize()}"
                    if show_original:
                        ax.plot(x, y, color=color, linestyle=ls, alpha=0.15,
                                linewidth=1.0, zorder=1)
                    ax.plot(x, smooth_curve(y, smooth_window), color=color,
                            linestyle=ls, linewidth=2.5, label=label, zorder=2)
                    plotted = True
            if not plotted:
                plt.close(fig)
                continue
            ax.set_xlabel("Epoch", fontweight="bold")
            ax.set_ylabel(ylabel, fontweight="bold")
            title = task.replace("_", " ").title()
            ax.set_title(f"{title} - {ylabel}", fontweight="bold", pad=20,
                         fontsize=15)
            ax.grid(True, alpha=0.3, linestyle="--", linewidth=0.5)
            ax.spines["top"].set_visible(False)
            ax.spines["right"].set_visible(False)
            handles, labels = ax.get_legend_handles_labels()
            ax.legend(handles, labels, loc="best", frameon=True, fancybox=True,
                      shadow=True, ncol=2 if len(handles) > 6 else 1,
                      fontsize=9.5)
            plt.tight_layout()
            path = os.path.join(out_dir, f"{prefix}{task}_{metric}.png")
            plt.savefig(path, dpi=300, bbox_inches="tight")
            plt.close(fig)
            written.append(path)
            print(f"  ✓ {path}")
    return written


# ---------------------------------------------------------------------------
# figure family 1b: reference-torch vs JAX cross-check curves
# ---------------------------------------------------------------------------

def crosscheck_curves(out_dir, crosscheck_paths=("REF_CROSSCHECK.json",
                                                 "REF_CROSSCHECK_SMALL.json",
                                                 "REF_CROSSCHECK_MEDIUM.json"),
                      jax_runs=(("default", "runs_ibtt/ibtt-sp_metrics.jsonl"),
                                ("small", "runs_ibtt/ibtt-sp-small_metrics.jsonl"),
                                ("medium", "runs_ibtt/ibtt-sp-medium_metrics.jsonl"),
                                ("default-f32", "runs_ibtt/ibtt-sp-f32_metrics.jsonl")),
                      out_name="ibtt_sp_crosscheck.png"):
    """Val-accuracy curves: the reference's own torch ibtt model
    (tools/ref_crosscheck.py) vs our JAX run, both trained on the SAME
    corpus at reference HPs. One panel per corpus (default 10-50-node mix,
    small 10-20 bucket). Two series per panel — reference in blue, ours in
    the ibtt green of the main comparison figures."""
    os.makedirs(out_dir, exist_ok=True)
    ref = {}
    for p in crosscheck_paths:
        if os.path.isfile(p):
            for corpus, rec in json.load(open(p)).items():
                ref[corpus] = rec
    jax = {}
    for corpus, path in jax_runs:
        if os.path.isfile(path):
            hist = load_jsonl(path)
            xy = [(row["epoch"], row["val/acc"]) for row in hist
                  if "val/acc" in row]
            if xy:
                jax[corpus] = xy
    # fallback when the per-epoch JAX logs aren't on disk: the committed
    # ablation summaries (ABLATIONS.json) carry best-val per corpus, drawn
    # as a level line so the torch-vs-JAX comparison stays in one figure
    jax_best = {}
    if os.path.isfile("ABLATIONS.json"):
        abl = json.load(open("ABLATIONS.json"))
        for key, corpus in (("ibtt-sp-small", "small"),
                            ("ibtt-sp-medium", "medium"),
                            ("ibtt-sp-f32", "default")):
            if corpus not in jax and key in abl:
                jax_best[corpus] = float(abl[key]["best_val"])
    panels = [c for c in ("small", "medium", "default")
              if c in ref or c in jax or c in jax_best]
    if not panels:
        print("  (no cross-check data yet)")
        return None
    fig, axes = plt.subplots(1, len(panels), figsize=(8 * len(panels), 5.5),
                             squeeze=False)
    for ax, corpus in zip(axes[0], panels):
        if corpus in ref:
            h = ref[corpus]["val_acc_history"]
            partial = " (partial)" if ref[corpus].get("partial") else ""
            ax.plot(range(1, len(h) + 1), h, color="#0173B2", linewidth=2,
                    label=f"reference torch impl{partial}")
        plotted_ours = False
        for key, label in ((corpus, "ours (JAX, bf16)"),
                           (corpus + "-f32", "ours (JAX, f32)")):
            if key in jax:
                x, y = map(np.asarray, zip(*jax[key]))
                ax.plot(x, y, color="#029E73" if not plotted_ours
                        else "#56C2A3", linewidth=2, label=label)
                plotted_ours = True
        if not plotted_ours and corpus in jax_best:
            ax.axhline(jax_best[corpus], color="#029E73", linewidth=2,
                       linestyle="--",
                       label=f"ours best val (ABLATIONS.json, "
                             f"{jax_best[corpus]:.3f})")
        ax.axhline(0.9706, color="#888888", linewidth=1, linestyle=":",
                   label="reference baseline corpus (0.9706)")
        ax.set_xlabel("Epoch", fontweight="bold")
        ax.set_ylabel("Validation accuracy", fontweight="bold")
        nice = {"default": "default corpus (10-50 nodes)",
                "small": "small bucket (10-20 nodes)",
                "medium": "medium bucket (20-40 nodes)"}[corpus]
        ax.set_title(f"ibtt shortest_path - {nice}", fontweight="bold")
        ax.set_ylim(0, 1.05)
        ax.grid(True, alpha=0.3, linestyle="--", linewidth=0.5)
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
        ax.legend(loc="lower right", frameon=True, fontsize=9.5)
    plt.tight_layout()
    path = os.path.join(out_dir, out_name)
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    print(f"  ✓ {path}")
    return path


def crosscheck_curves_r4(out_dir, crosscheck_path="REF_CROSSCHECK.json",
                         results_path="RESULTS.json",
                         out_name="family_crosscheck.png"):
    """Same-corpus crosscheck panels: the reference's own torch AGTT/MPNN
    (tools/ref_crosscheck.py --run all-r4) and the spec-faithful torch GPS
    stub (--run all-r5) trained on OUR campaign corpora, vs our committed
    best-val from the uniform campaign (RESULTS.json level line). One
    panel per (family, task); with the r5 gps rows the crosscheck covers
    all four model families."""
    if not os.path.isfile(crosscheck_path):
        print("  (no r4 cross-check data yet)")
        return None
    ref = json.load(open(crosscheck_path))
    ours = {}
    if os.path.isfile(results_path):
        res = json.load(open(results_path))
        for key in ("agtt-cycle", "agtt-sp", "mpnn-cycle", "mpnn-sp",
                    "gps-cycle", "gps-sp"):
            if key in res and "best_val" in res[key]:
                ours[key] = float(res[key]["best_val"])
    panels = [k for k in ("agtt-cycle", "agtt-sp", "mpnn-cycle", "mpnn-sp",
                          "gps-cycle", "gps-sp") if k in ref]
    if not panels:
        print("  (no r4 cross-check rows yet)")
        return None
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(1, len(panels), figsize=(6 * len(panels), 5),
                             squeeze=False)
    for ax, key in zip(axes[0], panels):
        h = ref[key]["val_acc_history"]
        ax.plot(range(1, len(h) + 1), h, color="#0173B2", linewidth=2,
                label=f"reference torch impl (best "
                      f"{ref[key]['best_val_acc']:.3f})")
        if key in ours:
            ax.axhline(ours[key], color="#029E73", linewidth=2,
                       linestyle="--",
                       label=f"ours best val (RESULTS.json, {ours[key]:.3f})")
        ax.set_xlabel("Epoch", fontweight="bold")
        ax.set_ylabel("Validation accuracy", fontweight="bold")
        ax.set_title(f"{key} — same corpus, reference HPs",
                     fontweight="bold")
        ax.set_ylim(0, 1.05)
        ax.grid(True, alpha=0.3, linestyle="--", linewidth=0.5)
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
        ax.legend(loc="lower right", frameon=True, fontsize=9.5)
    plt.tight_layout()
    path = os.path.join(out_dir, out_name)
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    print(f"  ✓ {path}")
    return path


# ---------------------------------------------------------------------------
# figure family 2: task label distributions (create_label_distribution_plots)
# ---------------------------------------------------------------------------

def _iter_task_records(data_root, task, algorithms, limit_graphs=200):
    """Yield (algorithm, record_text) from the corpus JSON layout."""
    for alg in algorithms:
        pat = os.path.join(data_root, "tasks_train", task, alg, "train",
                           "graph_*.json")
        for fp in sorted(glob.glob(pat))[:limit_graphs]:
            try:
                with open(fp) as f:
                    recs = json.load(f)
            except Exception:
                continue
            for rec in recs if isinstance(recs, list) else [recs]:
                text = rec.get("text") if isinstance(rec, dict) else rec
                if isinstance(text, str):
                    yield alg, text


def label_distribution_plots(out_dir, data_root="data/graph-token",
                             algorithms=("er", "ba", "sbm", "sfn", "complete",
                                         "star", "path")):
    """Cycle-count violins + shortest-path length distributions per
    algorithm (plot_figures.py:447-591)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from glearning_benchmark_tpu.data.text_grammar import (
        parse_distance_label_from_text,
        parse_graph_from_text,
    )

    os.makedirs(out_dir, exist_ok=True)
    written = []

    # cycle_check: number of independent cycles (E - N + components ~ E-N+1)
    data = defaultdict(list)
    for alg, text in _iter_task_records(data_root, "cycle_check", algorithms):
        try:
            nodes, edges = parse_graph_from_text(text)
        except Exception:
            continue
        und = {tuple(sorted(e)) for e in edges}
        data[alg].append(max(0, len(und) - max(len(nodes), 1) + 1))
    if data:
        fig, ax = plt.subplots(figsize=(12, 6))
        series = [(alg, data[alg]) for alg in algorithms if data.get(alg)]
        parts = ax.violinplot([v for _, v in series],
                              positions=range(len(series)),
                              showmeans=True, showmedians=True, widths=0.7)
        cmap = plt.cm.Set3(np.linspace(0, 1, max(len(series), 1)))
        for pc, c in zip(parts["bodies"], cmap):
            pc.set_facecolor(c)
            pc.set_alpha(0.7)
        ax.set_xticks(range(len(series)))
        ax.set_xticklabels([f"{a.upper()}\n(n={len(v)})" for a, v in series])
        ax.set_ylabel("Number of Cycles", fontweight="bold", fontsize=14)
        ax.set_title("Cycle Check - Distribution of Number of Cycles by "
                     "Algorithm", fontsize=16, fontweight="bold", pad=20)
        ax.grid(True, alpha=0.3, axis="y")
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
        plt.tight_layout()
        path = os.path.join(out_dir, "cycle_check_num_cycles_distribution.png")
        plt.savefig(path, dpi=300, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
        print(f"  ✓ {path}")

    # shortest_path: length distribution per algorithm (line + histogram)
    sp = defaultdict(list)
    for alg, text in _iter_task_records(data_root, "shortest_path", algorithms):
        lab = parse_distance_label_from_text(text)
        if lab is not None:
            sp[alg].append(lab + 1)  # back to 1-indexed lenK
    if sp:
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(16, 6))
        cmap = plt.cm.Set3(np.linspace(0, 1, len(algorithms)))
        for i, alg in enumerate(algorithms):
            if not sp.get(alg):
                continue
            counts = Counter(sp[alg])
            xs = sorted(counts)
            total = sum(counts.values())
            ax1.plot(xs, [counts[x] / total for x in xs], marker="o",
                     color=cmap[i], label=f"{alg.upper()} (n={total})")
        ax1.set_xlabel("Shortest Path Length", fontweight="bold")
        ax1.set_ylabel("Fraction of Queries", fontweight="bold")
        ax1.set_title("Shortest Path - Length Distribution by Algorithm",
                      fontweight="bold")
        ax1.grid(True, alpha=0.3)
        ax1.legend(fontsize=9)
        all_lengths = [x for v in sp.values() for x in v]
        ax2.hist(all_lengths, bins=range(1, max(all_lengths) + 2),
                 color="#0173B2", alpha=0.8, edgecolor="white")
        ax2.set_xlabel("Shortest Path Length", fontweight="bold")
        ax2.set_ylabel("Count", fontweight="bold")
        ax2.set_title("All Algorithms - Pooled", fontweight="bold")
        ax2.grid(True, alpha=0.3, axis="y")
        for ax in (ax1, ax2):
            ax.spines["top"].set_visible(False)
            ax.spines["right"].set_visible(False)
        plt.tight_layout()
        path = os.path.join(out_dir, "shortest_path_length_distribution.png")
        plt.savefig(path, dpi=300, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
        print(f"  ✓ {path}")
    return written


# ---------------------------------------------------------------------------
# figure family 3: ZINC distributions (create_zinc_distribution_plots)
# ---------------------------------------------------------------------------

def zinc_distribution_plots(out_dir, zinc_root="./data/ZINC", limit=2000):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from glearning_benchmark_tpu.data.zinc import (
        load_zinc_split,
        zinc_atom_symbol,
    )

    os.makedirs(out_dir, exist_ok=True)
    mols = load_zinc_split(zinc_root, "train", limit=limit)
    if not mols:
        print("no ZINC molecules found; skipping")
        return []
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    sizes = [m.num_nodes for m in mols]
    axes[0, 0].hist(sizes, bins=range(min(sizes), max(sizes) + 2),
                    color="#0173B2", alpha=0.8, edgecolor="white")
    axes[0, 0].set_title("Molecule Size (atoms)", fontweight="bold")
    atom_counts = Counter(int(a) for m in mols for a in m.node_labels)
    xs = sorted(atom_counts)
    axes[0, 1].bar([zinc_atom_symbol(x) for x in xs], [atom_counts[x] for x in xs],
                   color="#029E73", alpha=0.85)
    axes[0, 1].set_title("Atom Type Frequency", fontweight="bold")
    axes[0, 1].set_yscale("log")
    bond_counts = Counter(int(b) for m in mols for b in m.edge_labels)
    names = {1: "single", 2: "double", 3: "triple", 4: "aromatic"}
    xs = sorted(bond_counts)
    axes[1, 0].bar([names.get(x, str(x)) for x in xs],
                   [bond_counts[x] for x in xs], color="#DE8F05", alpha=0.85)
    axes[1, 0].set_title("Bond Type Frequency", fontweight="bold")
    axes[1, 0].set_yscale("log")
    ys = [m.y for m in mols]
    axes[1, 1].hist(ys, bins=50, color="#CC78BC", alpha=0.8, edgecolor="white")
    axes[1, 1].set_title("Regression Target (constrained solubility)",
                         fontweight="bold")
    for ax in axes.ravel():
        ax.grid(True, alpha=0.3)
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
    fig.suptitle(f"ZINC Distributions (n={len(mols)})", fontsize=16,
                 fontweight="bold")
    plt.tight_layout()
    path = os.path.join(out_dir, "zinc_distributions.png")
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    print(f"  ✓ {path}")
    return [path]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["curves", "labels", "zinc", "crosscheck",
                                     "all"])
    ap.add_argument("run_dirs", nargs="*", default=[])
    ap.add_argument("--out", default="figures")
    ap.add_argument("--data-root", default="data/graph-token")
    ap.add_argument("--zinc-root", default="./data/ZINC")
    ap.add_argument("--smooth-window", type=int, default=11)
    args = ap.parse_args()

    if args.mode in ("curves", "all") and args.run_dirs:
        comparison_curves(args.run_dirs, args.out,
                          smooth_window=args.smooth_window)
        # hard-preset runs share the run dirs; they get their own hard_*
        # figure files so the default headline figures stay unmixed
        comparison_curves(args.run_dirs, args.out,
                          smooth_window=args.smooth_window,
                          difficulty="hard", prefix="hard_")
    if args.mode in ("labels", "all"):
        label_distribution_plots(args.out, data_root=args.data_root)
    if args.mode in ("zinc", "all"):
        zinc_distribution_plots(args.out, zinc_root=args.zinc_root)
    if args.mode in ("crosscheck", "all"):
        crosscheck_curves(args.out)
        crosscheck_curves_r4(args.out)


if __name__ == "__main__":
    main()
