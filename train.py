#!/usr/bin/env python
"""CLI entry point: train any model family on any task.

    python train.py --model {ibtt,mpnn,ggps,agtt} [--config configs/X.yaml]
                    [--epochs N] [--limit N]

Mirrors the reference dispatcher (reference: train.py:61-171) minus the
three-conda-environment guard (train.py:19-58) — one JAX environment serves
every model on TPU.
"""

from __future__ import annotations

import argparse
import os

MODEL_DEFAULT_CONFIGS = {
    "ibtt": "configs/ibtt_graph_token.yaml",
    "mpnn": "configs/mpnn_graph_token.yaml",
    "ggps": "configs/gps_graph_token.yaml",
    "agtt": "configs/agtt_graph_token.yaml",
}


def main() -> None:
    ap = argparse.ArgumentParser(description="Train graph-learning benchmark models (TPU-native)")
    ap.add_argument("--model", required=True, choices=sorted(MODEL_DEFAULT_CONFIGS))
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--epochs", type=int, default=None, help="override train.epochs")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap examples per split (smoke runs)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the best checkpoint (params + optimizer "
                         "state + schedule step)")
    ap.add_argument("--eval-only", action="store_true",
                    help="no training: load the best checkpoint and score "
                         "the val and test splits")
    ap.add_argument("--checkpoint", default=None,
                    help="explicit checkpoint path for --resume/--eval-only "
                         "(default: <output.dir>/best_<run_name>)")
    args = ap.parse_args()

    config_path = args.config or MODEL_DEFAULT_CONFIGS[args.model]
    if not os.path.isfile(config_path):
        raise SystemExit(f"config not found: {config_path}")

    from glearning_benchmark_tpu.utils.config import load_config, normalize_config
    from glearning_benchmark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    config = normalize_config(load_config(config_path))
    if args.epochs is not None:
        config["train"]["epochs"] = args.epochs
    if args.resume or args.eval_only:
        config["train"]["resume"] = True
    if args.eval_only:
        config["train"]["epochs"] = 0
    if args.checkpoint:
        config["train"]["resume_path"] = args.checkpoint

    print(f"Loaded config from: {config_path}")
    print(f"Task: {config['dataset']['task']} | Model: {args.model}")

    from glearning_benchmark_tpu.train.trainer import train
    train(config, args.model, limit=args.limit)


if __name__ == "__main__":
    main()
