#!/usr/bin/env python
"""Epoch-level A/B: AdamW first moment in bf16 (`train.mu_dtype`).

MFU_ATTRIB_2048.json shows storing the AdamW mu in bf16 is worth ~2 MFU
points at production widths (hash-dropout base 0.402 -> 0.387 s/step,
54.2% -> 56.3%) by halving the first-moment HBM read+write per step.
Whether it can be the framework DEFAULT is an accuracy question at the
shipped benchmark configs, where models are small and any bf16-rounding
noise in the update direction would show first. This tool re-runs a
family-spanning subset of the RESULTS campaign with
`train.mu_dtype: bfloat16` (everything else identical, same watchdog
machinery) and compares best_val/test against the committed f32 rows in
RESULTS.json from the same code tip.

Decision rule (written into MU_AB.json): default flips to bf16 only if
every A/B'd config matches its f32 best_val within the seed-level spread
already documented for that family (RESULTS_seeds.json); otherwise
bf16 mu stays the documented opt-in for production-scale runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_benchmarks import RUNS_FULL, run_with_watchdog  # noqa: E402

AB_RUNS = ["ibtt-cycle", "agtt-zinc", "mpnn-cycle", "gps-sp"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated run names")
    ap.add_argument("--baseline", default="RESULTS.json")
    ap.add_argument("--out", default="MU_AB.json")
    ap.add_argument("--stall-secs", type=int, default=600)
    args = ap.parse_args()

    wanted = set((args.only or ",".join(AB_RUNS)).split(","))
    base = {}
    if os.path.isfile(args.baseline):
        base = json.load(open(args.baseline))

    rows = []
    os.makedirs("/tmp/gbt_runs", exist_ok=True)
    for name, model, config_path, overrides in RUNS_FULL:
        if name not in wanted:
            continue
        ov = dict(overrides)
        ov["train.mu_dtype"] = "bfloat16"
        print(f"== {name} (bf16 mu) ==", flush=True)
        r = run_with_watchdog(f"{name}-bf16mu", model, config_path, ov,
                              f"/tmp/gbt_runs/{name}-bf16mu.json",
                              args.stall_secs)
        b = base.get(name, {})
        row = {
            "run": name,
            "bf16_best_val": r.get("best_val"),
            "bf16_test": r.get("test"),
            "bf16_steady_epoch_s": r.get("steady_epoch_s"),
            "f32_best_val": b.get("best_val"),
            "f32_test": b.get("test"),
            "f32_steady_epoch_s": b.get("steady_epoch_s"),
        }
        if "error" in r:
            row["error"] = r["error"]
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump({
                "note": "train.mu_dtype bf16 vs f32 (RESULTS.json rows from "
                        "the same tip). Benchmark-scale models are tiny, so "
                        "this measures ACCURACY risk only; the ~2-MFU-point "
                        "perf win is a production-width effect "
                        "(MFU_ATTRIB_2048.json bf16_mu).",
                "rows": rows}, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
