#!/usr/bin/env python
"""Component probes for the ZINC stand-in target (r5 target design).

Trains family pairs on SINGLE-component variants of the stand-in target
(``dataset.zinc_target_weights`` — cache-safe config knob) to measure
which architecture each component favors, turning the within-class
ordering question into measured attribution:

- env1 [1,0,0,0.1]: 1-hop atom environments — mpnn vs gps
- env2 [0,1,0,0.1]: 2-hop environments (depth) — mpnn vs gps
- bond [0,0,1,0.1]: edge environments (atom,bond,atom) — ibtt vs agtt.
  Labeled SENT trails interleave node/atom/bond tokens, so an edge
  environment is a local ~6-gram for AGTT but an index join across the
  atom table for IBTT; if the hypothesis is right, bond-heavy targets
  pull AGTT ahead of IBTT (the reference's real-ZINC order).

    python tools/zinc_target_probe.py          # TPU, serial

Writes ZINC_TARGET_PROBE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_benchmarks import run_with_watchdog  # noqa: E402

CFG = {"ibtt": "configs/ibtt_zinc.yaml", "agtt": "configs/agtt_zinc.yaml",
       "mpnn": "configs/mpnn_zinc.yaml", "ggps": "configs/gps_zinc.yaml"}

PROBES = [
    ("env1", [1.0, 0.0, 0.0, 0.1], ["mpnn", "ggps"]),
    ("env2", [0.0, 1.0, 0.0, 0.1], ["mpnn", "ggps"]),
    ("bond", [0.0, 0.0, 1.0, 0.1], ["ibtt", "agtt"]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ZINC_TARGET_PROBE.json")
    ap.add_argument("--stall-secs", type=int, default=1200)
    args = ap.parse_args()

    results = {}
    if os.path.isfile(args.out):
        results = json.load(open(args.out))

    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for probe, weights, fams in PROBES:
        for fam in fams:
            key = f"{probe}-{fam}"
            if key in results and "error" not in results[key]:
                print(f"[{key}] cached", flush=True)
                continue
            ov = {"dataset.zinc_target_weights": weights,
                  "train.epochs_per_dispatch": 10,
                  "output.run_name": f"zinc-probe-{key}"}
            print(f"\n{'=' * 70}\nPROBE {key} w={weights}\n{'=' * 70}",
                  flush=True)
            res = run_with_watchdog(key, fam, CFG[fam], ov,
                                    f"/tmp/gbt_runs/probe-{key}.json",
                                    args.stall_secs)
            results[key] = {"probe": probe, "family": fam,
                            "weights": weights,
                            "best_val": res.get("best_val"),
                            "test_mae": res.get("test", {}).get("mae"),
                            **({"error": res["error"]} if "error" in res
                               else {})}
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            print(f"[{key}] -> {json.dumps(results[key])}", flush=True)

    for probe, _, fams in PROBES:
        vals = {f: results.get(f"{probe}-{f}", {}).get("best_val")
                for f in fams}
        print(f"{probe}: " + "  ".join(
            f"{f}={v:.4f}" if v is not None else f"{f}=?"
            for f, v in vals.items()))


if __name__ == "__main__":
    main()
