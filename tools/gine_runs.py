#!/usr/bin/env python
"""GINE edge-feature A/B on ZINC (round-2 backlog #7, beyond reference
parity — the reference's GINConv/GPS local block is edge-feature-free,
train_mpnn.py:17-60, train_ggps.py:34-58).

Trains mpnn/ggps on the ZINC corpus with ``model.edge_features: true``
(bond-type GINE messages) at otherwise-identical hyperparameters; compare
MAE against the plain runs in RESULTS.json.

    python tools/gine_runs.py [--stall-secs 1200] [--out GINE.json]

Serial (single-client TPU tunnel), watchdogged like the main campaign.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_benchmarks import run_with_watchdog  # noqa: E402

RUNS = [
    ("mpnn-zinc-gine", "mpnn", "configs/mpnn_zinc.yaml",
     {"model.edge_features": True, "train.epochs_per_dispatch": 10,
      "output.run_name": "mpnn-zinc-gine"}),
    ("gps-zinc-gine", "ggps", "configs/gps_zinc.yaml",
     {"model.edge_features": True, "train.epochs_per_dispatch": 10,
      "output.run_name": "gps-zinc-gine"}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="GINE.json")
    ap.add_argument("--stall-secs", type=int, default=1200)
    args = ap.parse_args()

    results = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            results = json.load(f)

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for name, model, config_path, overrides in RUNS:
        print(f"\n{'=' * 80}\nGINE RUN {name}\n{'=' * 80}", flush=True)
        results[name] = run_with_watchdog(
            name, model, config_path, overrides,
            f"/tmp/gbt_runs/{name}.json", args.stall_secs)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[{name}] -> {json.dumps(results[name])}", flush=True)


if __name__ == "__main__":
    main()
