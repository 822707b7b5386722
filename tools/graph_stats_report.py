#!/usr/bin/env python
"""Generation-quality / corpus-characterization report.

The AutoGraph stack the reference depends on evaluates graph generators
with ORCA orbit counts + MMD statistics; the reference's own
test/data_distribution_test.py characterizes corpora per algorithm. This
tool does both against the in-framework generator: per-algorithm summary
statistics and a pairwise MMD matrix (degree / clustering / orbit) across
algorithms, using the native C++ orbit counter (native/gstats.cpp).

    PALLAS_AXON_POOL_IPS= python tools/graph_stats_report.py \
        [--algorithms er ba sbm sfn] [--graphs 120] [--out GRAPH_STATS.json]

Writes the JSON report and (with --plot) an MMD heatmap PNG per statistic.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glearning_benchmark_tpu.data import generator as G  # noqa: E402
from glearning_benchmark_tpu.eval.graph_stats import (  # noqa: E402
    clustering_coefficients,
    compare_corpora,
    orbit_counts_batch,
)


def summarize(graphs) -> dict:
    nn = np.array([g.num_nodes for g in graphs])
    ne = np.array([len(g.edges) for g in graphs])
    edges = [np.asarray(g.edges).reshape(-1, 2) for g in graphs]
    clus = np.array([clustering_coefficients(e, int(n)).mean()
                     for e, n in zip(edges, nn)])
    orb = np.stack([o.mean(0) for o in
                    orbit_counts_batch(edges, nn.tolist())])
    return {
        "nodes_mean": round(float(nn.mean()), 2),
        "edges_mean": round(float(ne.mean()), 2),
        "clustering_mean": round(float(clus.mean()), 4),
        "triangles_per_node_mean": round(float(orb[:, 3].mean()), 3),
        "squares_per_node_mean": round(float(orb[:, 8].mean()), 3),
        "k4_per_node_mean": round(float(orb[:, 14].mean()), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algorithms", nargs="+",
                    default=["er", "ba", "sbm", "sfn", "complete", "star",
                             "path"])
    ap.add_argument("--graphs", type=int, default=120)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="GRAPH_STATS.json")
    ap.add_argument("--plot", action="store_true",
                    help="also write MMD heatmap PNGs next to --out")
    args = ap.parse_args()

    corpora = {}
    for algo in args.algorithms:
        corpora[algo] = [
            G.generate_graph(algo, G.graph_seed(args.seed, algo, "eval", i))
            for i in range(args.graphs)]

    report = {"n_graphs": args.graphs,
              "summary": {a: summarize(gs) for a, gs in corpora.items()},
              "mmd": {}}
    algos = list(args.algorithms)
    for i, a in enumerate(algos):
        for b in algos[i:]:
            if a == b:  # split-half self-distance = the noise floor
                half = args.graphs // 2
                cmp_ = compare_corpora(corpora[a][:half], corpora[a][half:])
            else:
                cmp_ = compare_corpora(corpora[a], corpora[b])
            report["mmd"][f"{a}|{b}"] = {
                k: round(v, 6) for k, v in cmp_.items()
                if k.endswith("_mmd")}

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    for a in algos:
        print(f"  {a:9s} {report['summary'][a]}")
    print("  pairwise degree-MMD (diagonal = split-half noise floor):")
    for a in algos:
        row = []
        for b in algos:
            key = f"{a}|{b}" if f"{a}|{b}" in report["mmd"] else f"{b}|{a}"
            row.append(f"{report['mmd'][key]['degree_mmd']:.3f}")
        print(f"    {a:9s} " + " ".join(row))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        base = os.path.splitext(args.out)[0]
        for stat in ("degree_mmd", "clustering_mmd", "orbit_mmd"):
            m = np.zeros((len(algos), len(algos)))
            for i, a in enumerate(algos):
                for j, b in enumerate(algos):
                    key = f"{a}|{b}" if f"{a}|{b}" in report["mmd"] else f"{b}|{a}"
                    m[i, j] = report["mmd"][key][stat]
            fig, ax = plt.subplots(figsize=(5.2, 4.4))
            im = ax.imshow(m, cmap="viridis")
            ax.set_xticks(range(len(algos)), algos, rotation=45, ha="right")
            ax.set_yticks(range(len(algos)), algos)
            ax.set_title(f"{stat} between generator corpora")
            fig.colorbar(im)
            fig.tight_layout()
            path = f"{base}_{stat}.png"
            fig.savefig(path, dpi=120)
            plt.close(fig)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
