#!/usr/bin/env python
"""epochs_per_dispatch ablation: where does the per-epoch floor flatten?

ROOFLINE.json places every benchmark-scale epoch 5-94x above its MXU FLOP
bound with per-step overhead binding (the models are d_model 16-64). The
one lever that attacks pure dispatch overhead is ``train.epochs_per_dispatch``
(K epochs inside ONE jitted lax.scan, exact on-device best-epoch selection,
train/trainer.py), so this tool sweeps K and records where the steady epoch
time flattens — separating tunnel/host dispatch cost (amortized ~1/K) from
the residual XLA per-step cost (the floor).

    python tools/epd_sweep.py [--configs ibtt,mpnn] [--ks 1,4,16,64]

For each (config, K): train 3*K epochs (>=12) and take the fastest
per-epoch time among blocks AFTER the first (the first block pays compile).
Writes EPD_SWEEP.json. Run strictly serially against the tunneled TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "ibtt": "configs/ibtt_graph_token.yaml",
    "mpnn": "configs/mpnn_graph_token.yaml",
    "agtt-zinc": "configs/agtt_zinc.yaml",
}


def run_one(name: str, k: int, out_dir: str) -> dict:
    from glearning_benchmark_tpu.train.trainer import train
    from glearning_benchmark_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, CONFIGS[name]))
    cfg["train"]["epochs_per_dispatch"] = k
    cfg["train"]["epochs"] = max(3 * k, 12)
    cfg.setdefault("output", {})
    cfg["output"]["out_dir"] = out_dir
    cfg["output"]["run_name"] = f"{name}-epd{k}"
    cfg["wandb"] = {"use": False}

    model_name = "ggps" if name.startswith("gps") else name.split("-")[0]
    t0 = time.time()
    res = train(cfg, model_name, verbose=False)
    wall = time.time() - t0

    durs = [h["time/epoch_duration"] for h in res.history]
    # one duration value per block (dur = block_s / k); skip block 0 (compile)
    block_durs = durs[k::k] or durs[-1:]
    steady = min(block_durs)
    return {"config": name, "epochs_per_dispatch": k,
            "epochs": cfg["train"]["epochs"],
            "steady_epoch_s": round(steady, 4),
            "first_block_epoch_s": round(durs[0], 4),
            "wall_s": round(wall, 1),
            "best_val": float(res.best_val)}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", default="ibtt,mpnn,agtt-zinc")
    ap.add_argument("--ks", default="1,4,16,64")
    ap.add_argument("--out-dir", default="runs_epd")
    ap.add_argument("--out", default="EPD_SWEEP.json")
    args = ap.parse_args()
    # anchor artifacts at the repo root regardless of CWD (matches
    # scaling_bench) so resume finds the committed file
    for attr in ("out", "out_dir"):
        v = getattr(args, attr)
        if not os.path.isabs(v):
            setattr(args, attr, os.path.join(REPO, v))

    from glearning_benchmark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out)).get("rows", [])
    done = {(r["config"], r["epochs_per_dispatch"]) for r in rows}
    for name in args.configs.split(","):
        for k in (int(x) for x in args.ks.split(",")):
            if (name, k) in done:
                continue
            r = run_one(name, k, args.out_dir)
            print(json.dumps(r), flush=True)
            rows.append(r)
            with open(args.out, "w") as f:
                json.dump({"backend": jax.default_backend(),
                           "note": "steady per-epoch seconds vs "
                                   "epochs_per_dispatch K (min over "
                                   "post-compile blocks; dur = block_s/K). "
                                   "The flattening point separates dispatch "
                                   "overhead (~1/K) from the XLA per-step "
                                   "floor.",
                           "rows": rows}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
