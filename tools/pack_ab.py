#!/usr/bin/env python
"""Sequence-packing A/B (VERDICT r1 next-step #6 done criterion): measured
epoch-time reduction at equal accuracy on ibtt-cycle and agtt-sp.

Runs the two configurations with dataset.pack on; the unpacked baselines
are the same-named rows of RESULTS.json from the main campaign (same code,
same corpus). Writes PACK_AB.json with both sides and the deltas.

    python tools/pack_ab.py     # on the TPU (serial — single client)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_benchmarks import run_with_watchdog  # noqa: E402

RUNS = [
    ("ibtt-cycle-pack", "ibtt", "configs/ibtt_graph_token.yaml",
     {"dataset.pack": True, "output.run_name": "ibtt-cycle-pack"}),
    ("agtt-sp-pack", "agtt", "configs/agtt_graph_token.yaml",
     {"dataset.task": "shortest_path", "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "dataset.num_graphs": 500,
      "train.epochs": 300, "train.epochs_per_dispatch": 25,
      "dataset.pack": True, "output.run_name": "agtt-sp-pack"}),
]

BASELINE_ROWS = {"ibtt-cycle-pack": "ibtt-cycle", "agtt-sp-pack": "agtt-sp"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PACK_AB.json")
    ap.add_argument("--stall-secs", type=int, default=1200)
    args = ap.parse_args()

    results = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            results = json.load(f)

    baselines = {}
    if os.path.isfile("RESULTS.json"):
        with open("RESULTS.json") as f:
            baselines = json.load(f)

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for name, model, config_path, overrides in RUNS:
        print(f"\n{'=' * 80}\nPACK A/B {name}\n{'=' * 80}", flush=True)
        res = run_with_watchdog(name, model, config_path, overrides,
                                f"/tmp/gbt_runs/{name}.json", args.stall_secs)
        base = baselines.get(BASELINE_ROWS[name], {})
        if "error" not in res and base:
            res["unpacked_best_val"] = base.get("best_val")
            res["unpacked_steady_epoch_s"] = base.get("steady_epoch_s")
            if base.get("steady_epoch_s"):
                res["epoch_time_ratio"] = round(
                    res["steady_epoch_s"] / base["steady_epoch_s"], 3)
        results[name] = res
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[{name}] -> {json.dumps(res)}", flush=True)


if __name__ == "__main__":
    main()
