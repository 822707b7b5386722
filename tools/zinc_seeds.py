#!/usr/bin/env python
"""Seed sensitivity of the ZINC stand-in family ordering (r5).

The v2 locality-dominated target restores the reference's central ZINC
split — graph-native (MPNN/GPS) far below serialization (IBTT/AGTT) —
but both WITHIN-class adjacent pairs are close (gps 0.696 vs mpnn 0.765;
ibtt 1.169 vs agtt 1.191), as they are in the reference's published
numbers (mpnn 0.4615 vs gps 0.5002; agtt 0.6306 vs ibtt 0.6620). This
tool trains every family at additional seeds so the within-pair gaps can
be compared against seed-to-seed spread: if the spread covers the gap,
the pair order is statistically unresolved at reference HPs and the
documented claim is the class split plus measured ties, not a pretended
total order.

    python tools/zinc_seeds.py [--seeds 1,2]   # TPU, serial

Writes ZINC_SEEDS.json (one row per family x seed; seed 0 rows are
copied from RESULTS.json for completeness).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_benchmarks import run_with_watchdog  # noqa: E402

FAMILIES = [
    ("ibtt", "configs/ibtt_zinc.yaml"),
    ("agtt", "configs/agtt_zinc.yaml"),
    ("mpnn", "configs/mpnn_zinc.yaml"),
    ("ggps", "configs/gps_zinc.yaml"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="1,2")
    ap.add_argument("--out", default="ZINC_SEEDS.json")
    ap.add_argument("--stall-secs", type=int, default=1200)
    args = ap.parse_args()

    results = {}
    if os.path.isfile(args.out):
        results = json.load(open(args.out))

    # seed-0 rows from the committed campaign
    if os.path.isfile("RESULTS.json"):
        res = json.load(open("RESULTS.json"))
        name_map = {"ibtt": "ibtt-zinc", "agtt": "agtt-zinc",
                    "mpnn": "mpnn-zinc", "ggps": "gps-zinc"}
        for fam, row in name_map.items():
            if row in res and "best_val" in res[row]:
                results.setdefault(f"{fam}-s0", {
                    "family": fam, "seed": 0,
                    "best_val": res[row]["best_val"],
                    "test_mae": res[row].get("test", {}).get("mae"),
                    "source": "RESULTS.json"})

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for seed_s in args.seeds.split(","):
        seed = int(seed_s)
        for fam, cfg in FAMILIES:
            key = f"{fam}-s{seed}"
            if key in results and "error" not in results[key]:
                print(f"[{key}] cached", flush=True)
                continue
            ov = {"train.seed": seed, "train.epochs_per_dispatch": 10,
                  "output.run_name": f"{fam}-zinc-s{seed}"}
            print(f"\n{'=' * 70}\nZINC SEED {key}\n{'=' * 70}", flush=True)
            res = run_with_watchdog(key, fam if fam != "ggps" else "ggps",
                                    cfg, ov, f"/tmp/gbt_runs/{key}.json",
                                    args.stall_secs)
            results[key] = {"family": fam, "seed": seed,
                            "best_val": res.get("best_val"),
                            "test_mae": res.get("test", {}).get("mae"),
                            **({"error": res["error"]} if "error" in res
                               else {})}
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            print(f"[{key}] -> {json.dumps(results[key])}", flush=True)

    # ordering summary across seeds
    fams = ("mpnn", "ggps", "agtt", "ibtt")
    by_fam = {f: sorted(v["best_val"] for k, v in results.items()
                        if v.get("family") == f and v.get("best_val")
                        is not None) for f in fams}
    summary = {f: {"vals": [round(x, 4) for x in v],
                   "spread": round(max(v) - min(v), 4) if v else None}
               for f, v in by_fam.items()}
    results["_summary"] = summary
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
