#!/usr/bin/env python
"""Roofline placement for the benchmark training epochs.

For each RESULTS.json run this computes two per-epoch lower bounds on a
single TPU v5e chip and places the measured steady epoch time against them:

- FLOP bound:  model fwd+bwd FLOPs / peak bf16 MXU throughput
- HBM bound:   minimum activation+parameter traffic / peak HBM bandwidth

The point (documented in STATUS.md): at the reference's own model scale
(d_model 16-64, 10k-sample corpora) the epochs are nowhere near the MXU
FLOP roofline — they are bandwidth- and dispatch-latency-bound, which is
why the engineering levers that actually moved epoch time were packing
(fewer rows), flash attention (no [B,H,L,L] HBM round-trip), bf16 compute,
and epochs_per_dispatch (amortized dispatch latency), not kernel FLOPs.

    PALLAS_AXON_POOL_IPS= python tools/roofline.py [--out ROOFLINE.json]

CPU-only: reads RESULTS.json + configs, builds dataset metadata to get the
real row/bucket shapes, performs no training.

Caveat: the bounds model the train split's forward+backward only, while
the measured steady epoch also runs the per-epoch validation pass — the
x_of_bound figures are therefore upper bounds on the true gap. The
qualitative placement (overhead-bound at reference model scale) is
insensitive to this.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glearning_benchmark_tpu.utils.config import load_config, normalize_config  # noqa: E402
from tools.run_benchmarks import RUNS_FULL, apply_overrides  # noqa: E402

# TPU v5e (single chip) public specs
PEAK_BF16_FLOPS = 197e12      # MXU bf16
PEAK_HBM_BYTES = 819e9        # HBM bandwidth


def transformer_cost(n_rows, L, d, dff, layers, heads, packed_density=1.0):
    """Per-epoch fwd+bwd FLOPs and minimum HBM bytes for the encoder.

    FLOPs: per token, per layer: qkv 2*3d^2 + out 2d^2 + ff 2*2*d*dff,
    attention 2*2*L*d (QK^T + PV, flash or not); backward ~2x forward.
    Bytes: activations read+write per layer (~6 tensors of [T, d] bf16) +
    attention K/V streaming (flash: Q,K,V once) — a deliberate lower bound
    (perfect fusion, no re-reads).
    """
    T = n_rows * L * packed_density
    lin = (2 * 3 * d * d) + (2 * d * d) + (2 * 2 * d * dff)
    attn = 2 * 2 * L * d
    fwd = T * layers * (lin + attn)
    flops = 3 * fwd  # fwd + ~2x bwd
    act_bytes = T * layers * 6 * d * 2 * 2   # 6 tensors, bf16, fwd+bwd
    return flops, act_bytes


def gnn_cost(n_graphs, n_max, hidden, layers):
    """Dense-adjacency GIN: per layer A@H (2*N^2*d) + MLP (2*2*d^2*N)."""
    fwd = n_graphs * layers * (2 * n_max * n_max * hidden +
                               2 * 2 * hidden * hidden * n_max)
    flops = 3 * fwd
    bytes_ = n_graphs * layers * (n_max * n_max +          # adj uint8
                                  6 * n_max * hidden * 2) * 2
    return flops, bytes_


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="RESULTS.json")
    ap.add_argument("--out", default="ROOFLINE.json")
    ap.add_argument("--dispatch-latency-ms", type=float, default=4.0,
                    help="amortized per-epoch dispatch cost with "
                         "epochs_per_dispatch=10 over the TPU tunnel")
    args = ap.parse_args()

    with open(args.results) as f:
        results = json.load(f)

    from glearning_benchmark_tpu.train.datasets import (
        build_agtt_dataset, build_graph_dataset, build_ibtt_dataset)
    builders = {"ibtt": build_ibtt_dataset, "agtt": build_agtt_dataset,
                "mpnn": build_graph_dataset, "ggps": build_graph_dataset}

    report = {}
    for name, model, config_path, overrides in RUNS_FULL:
        if name not in results or "error" in results[name]:
            continue
        cfg = apply_overrides(normalize_config(load_config(config_path)),
                              overrides)
        bundle = builders[model](cfg["dataset"], seed=cfg["train"].get("seed", 0))
        tr = bundle.splits["train"]
        mcfg = cfg.get("model", {})
        if model in ("ibtt", "agtt"):
            ids = tr["ids"]
            n_rows, L = ids.shape
            if "seg" in tr:  # packed rows: real tokens / slot tokens
                density = float((tr["seg"] > 0).mean())
            else:
                density = float(tr["mask"].mean())
            flops, hbm = transformer_cost(
                n_rows, L, int(mcfg.get("d_model", 32)),
                int(mcfg.get("d_ff", 128)), int(mcfg.get("nlayers", 4)),
                int(mcfg.get("nhead", 4)), packed_density=density)
        else:
            n_graphs = len(tr["y"])
            n_max = tr["adj"].shape[-1]
            flops, hbm = gnn_cost(n_graphs, n_max,
                                  int(mcfg.get("hidden_dim", 64)),
                                  int(mcfg.get("num_layers", 5)))
        flop_bound = flops / PEAK_BF16_FLOPS
        hbm_bound = hbm / PEAK_HBM_BYTES
        measured = results[name]["steady_epoch_s"]
        bound = max(flop_bound, hbm_bound) + args.dispatch_latency_ms / 1e3
        n_items = int(n_rows if model in ("ibtt", "agtt") else n_graphs)
        batch = int(cfg["train"].get("batch_size", 128))
        steps = max(1, -(-n_items // batch))
        report[name] = {
            "rows_or_graphs": n_items,
            "steps_per_epoch": steps,
            "ms_per_step": round(measured / steps * 1e3, 3),
            "epoch_flops": float(flops),
            "flop_bound_s": round(flop_bound, 6),
            "hbm_bound_s": round(hbm_bound, 6),
            "bound_s": round(bound, 5),
            "measured_s": measured,
            "x_of_bound": round(measured / bound, 1),
            "binding": ("flops" if flop_bound > hbm_bound else "hbm")
                       if max(flop_bound, hbm_bound) > args.dispatch_latency_ms / 1e3
                       else "per-step overhead",
        }
        r = report[name]
        print(f"{name:12s} flops={r['epoch_flops']:.2e} "
              f"flop_bound={r['flop_bound_s']*1e3:7.2f}ms "
              f"hbm_bound={r['hbm_bound_s']*1e3:7.2f}ms "
              f"measured={measured*1e3:8.1f}ms "
              f"({steps} steps, {r['ms_per_step']:.2f} ms/step) "
              f"{r['x_of_bound']:6.1f}x of bound ({r['binding']}-bound)")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
