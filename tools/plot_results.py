#!/usr/bin/env python
"""Publication plotting from run metric logs (the reference's figures/
plot_figures.py works from W&B CSV exports; ours reads the JSONL metric logs
every run writes — reference column schema preserved in the keys).

    python tools/plot_results.py runs_ibtt/*.jsonl --out figures/
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def load_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+", help="metric JSONL files")
    ap.add_argument("--out", default="figures_out")
    ap.add_argument("--metrics", default="val/acc,val/loss,val/mae,throughput/graphs_per_sec")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    wanted = args.metrics.split(",")
    series = defaultdict(dict)  # metric -> run -> (epochs, values)
    for path in args.logs:
        run = os.path.basename(path).replace("_metrics.jsonl", "")
        rows = [r for r in load_jsonl(path) if "epoch" in r]
        for metric in wanted:
            pts = [(r["epoch"], r[metric]) for r in rows if metric in r]
            if pts:
                series[metric][run] = tuple(zip(*pts))

    for metric, runs in series.items():
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for run, (xs, ys) in sorted(runs.items()):
            ax.plot(xs, ys, label=run, linewidth=1.5)
        ax.set_xlabel("epoch")
        ax.set_ylabel(metric)
        ax.set_title(metric)
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        fname = metric.replace("/", "_") + ".png"
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, fname), dpi=140)
        plt.close(fig)
        print(f"wrote {os.path.join(args.out, fname)}")


if __name__ == "__main__":
    main()
