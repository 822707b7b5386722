#!/usr/bin/env python
"""Epoch-level A/B: packed synthetic configs with model.use_flash on vs off.

The microbenchmark (tools/flash_ab.py) is dispatch-latency-dominated over
the tunneled backend (~36 ms floor), so the default decision for the
synthetic configs is made here instead: full training runs, steady epoch
time from the last half of history, equal-accuracy check on best val.
Writes FLASH_EPOCH_AB.json.

    python tools/flash_epoch_ab.py     # on the TPU (serial — single client)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_benchmarks import run_with_watchdog  # noqa: E402

BASE_RUNS = [
    ("ibtt-cycle", "ibtt", "configs/ibtt_graph_token.yaml",
     {"dataset.pack": True}),
    ("ibtt-sp", "ibtt", "configs/ibtt_graph_token.yaml",
     {"dataset.task": "shortest_path", "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "train.epochs": 300,
      "train.epochs_per_dispatch": 25, "dataset.pack": True}),
    ("agtt-sp", "agtt", "configs/agtt_graph_token.yaml",
     {"dataset.task": "shortest_path", "dataset.train_algorithms": ["path"],
      "dataset.test_algorithm": "er", "dataset.num_graphs": 500,
      "train.epochs": 300, "train.epochs_per_dispatch": 25,
      "dataset.pack": True}),
    # the two zinc configs at their shipped settings (agtt packs, ibtt
    # doesn't — ZINC_PACK_AB.json): these are the configs whose
    # use_flash: true default the scanned microbench (FLASH_AB.json r3)
    # now contradicts, so the epoch-level rerun is the decider
    ("ibtt-zinc", "ibtt", "configs/ibtt_zinc.yaml",
     {"train.epochs_per_dispatch": 10}),
    ("agtt-zinc", "agtt", "configs/agtt_zinc.yaml",
     {"train.epochs_per_dispatch": 10}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="FLASH_EPOCH_AB.json")
    ap.add_argument("--stall-secs", type=int, default=1200)
    args = ap.parse_args()

    results = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            results = json.load(f)

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for base_name, model, config_path, overrides in BASE_RUNS:
        for flash in (False, True):
            name = f"{base_name}-{'flash' if flash else 'xla'}"
            if name in results and "error" not in results[name]:
                print(f"[{name}] cached", flush=True)
                continue
            ov = dict(overrides)
            ov["model.use_flash"] = flash
            ov["output.run_name"] = name
            print(f"\n{'=' * 80}\nFLASH EPOCH A/B {name}\n{'=' * 80}",
                  flush=True)
            res = run_with_watchdog(name, model, config_path, ov,
                                    f"/tmp/gbt_runs/{name}.json",
                                    args.stall_secs)
            results[name] = res
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            print(f"[{name}] -> {json.dumps(res)}", flush=True)

    for base_name, _, _, _ in BASE_RUNS:
        a = results.get(f"{base_name}-xla", {})
        b = results.get(f"{base_name}-flash", {})
        if a.get("steady_epoch_s") and b.get("steady_epoch_s"):
            summ = {
                "xla_epoch_s": a["steady_epoch_s"],
                "flash_epoch_s": b["steady_epoch_s"],
                "speedup": round(a["steady_epoch_s"] / b["steady_epoch_s"], 3),
                "xla_best_val": a.get("best_val"),
                "flash_best_val": b.get("best_val"),
            }
            results[f"{base_name}-summary"] = summ
            print(f"[{base_name}] {json.dumps(summ)}", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
