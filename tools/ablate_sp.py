#!/usr/bin/env python
"""ibtt shortest_path parity ablations (VERDICT r1 next-step #1).

With emission/sampling now byte-matched to the reference pipeline
(all-pairs emission, INF-inclusive 10-pairs/graph sampling, TokenDataset
require_label drop), ibtt-sp at reference hyperparameters still sits at
~0.65 val vs the 0.9706 baseline. Two hypotheses remain, each isolated
here at otherwise-reference HPs (lr 1e-3, 300 epochs):

  f32    — bf16 rounding stalls optimization at d_model=16 (the reference
           trains f32 on an A30).
  small  — the reference's shortest_path corpus used small graphs only:
           docs/synthetic_data.md's pair-count example tops out at 19
           nodes, and len<=7 distance labels cover most pairs only for
           10-20-node graphs.
  medium — 20-40-node bucket, the middle point of the size sweep.

Measured (ABLATIONS.json): small 1.000 (bf16 AND f32), medium 0.701,
default 10-50 mix 0.64-0.65 — monotone in graph size at fixed reference
HPs, i.e. the residual gap vs the 0.9706 baseline is corpus-size-
intrinsic, not a recipe/precision artifact.

    python tools/ablate_sp.py [--only f32,small] [--out ABLATIONS.json]

Serial (single-client TPU tunnel), watchdogged like the main campaign.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_benchmarks import run_with_watchdog  # noqa: E402

SP_BASE = {
    "dataset.task": "shortest_path",
    "dataset.train_algorithms": ["path"],
    "dataset.test_algorithm": "er",
    "train.epochs": 300,
    "train.epochs_per_dispatch": 25,
}

ABLATIONS = [
    ("ibtt-sp-f32", "ibtt", "configs/ibtt_graph_token.yaml",
     {**SP_BASE, "model.compute_dtype": "float32",
      "output.run_name": "ibtt-sp-f32"}),
    ("ibtt-sp-small", "ibtt", "configs/ibtt_graph_token.yaml",
     {**SP_BASE, "dataset.graph_token_root": "data/graph-token-small",
      "dataset.size_buckets": ["small"],
      "output.run_name": "ibtt-sp-small"}),
    # middle point of the size sweep: 20-40-node graphs. Together with
    # small (1.000) and the 10-50 default (0.64) this shows accuracy
    # degrading monotonically with graph size at fixed reference HPs —
    # the corpus-size-intrinsic explanation, not a recipe artifact.
    ("ibtt-sp-medium", "ibtt", "configs/ibtt_graph_token.yaml",
     {**SP_BASE, "dataset.graph_token_root": "data/graph-token-medium",
      "dataset.size_buckets": ["medium"],
      "output.run_name": "ibtt-sp-medium"}),
    # combined: if each alone falls short, their interaction
    ("ibtt-sp-small-f32", "ibtt", "configs/ibtt_graph_token.yaml",
     {**SP_BASE, "dataset.graph_token_root": "data/graph-token-small",
      "dataset.size_buckets": ["small"], "model.compute_dtype": "float32",
      "output.run_name": "ibtt-sp-small-f32"}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="ABLATIONS.json")
    ap.add_argument("--stall-secs", type=int, default=1200)
    args = ap.parse_args()

    runs = ABLATIONS
    if args.only:
        wanted = {f"ibtt-sp-{x}" for x in args.only.split(",")}
        runs = [r for r in runs if r[0] in wanted]

    results = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            results = json.load(f)

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for name, model, config_path, overrides in runs:
        print(f"\n{'=' * 80}\nABLATION {name}\n{'=' * 80}", flush=True)
        results[name] = run_with_watchdog(
            name, model, config_path, overrides,
            f"/tmp/gbt_runs/{name}.json", args.stall_secs)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[{name}] -> {json.dumps(results[name])}", flush=True)


if __name__ == "__main__":
    main()
