#!/usr/bin/env python
"""Batched inference CLI (the serving entry point).

The reference benchmark stops at training — its only use of the best
checkpoint is the in-process final test pass (reference
trainer/train_ibtt.py:579-580). This CLI serves a trained checkpoint on
new inputs:

    python predict.py --checkpoint out/best_run --input records.json
    python predict.py --checkpoint out/best_run --zinc-split val

Inputs: a graph-token records file (JSON array / JSONL / raw text lines —
the same format-tolerant reader training uses, data/loader.py), or for
zinc checkpoints a ZINC split (real export if present, else the stand-in).
Output: one JSON line per example on stdout (or --output): the predicted
class id + human-readable label and confidence for classification, the
predicted value for regression. A throughput summary goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _records_from_file(path: str, task: str):
    from glearning_benchmark_tpu.data.loader import (
        _extract_text_and_label,
        _read_records,
    )
    out = []
    for rec in _read_records(path):
        text, label, _query = _extract_text_and_label(rec, task)
        if text:
            out.append({"text": text, "label": label})
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint stem or .npz (out/best_<run>)")
    ap.add_argument("--model", default=None,
                    help="model name for pre-serving checkpoints "
                         "(new checkpoints store it)")
    ap.add_argument("--input", default=None,
                    help="records file (JSON array / JSONL / raw text lines)")
    ap.add_argument("--zinc-split", default=None,
                    choices=["train", "val", "test"],
                    help="predict a ZINC split instead of --input")
    ap.add_argument("--zinc-root", default="./data/ZINC")
    ap.add_argument("--output", default=None, help="JSONL out (default stdout)")
    ap.add_argument("--max-batch", type=int, default=512)
    args = ap.parse_args()

    from glearning_benchmark_tpu.serve import Predictor, predict_records
    from glearning_benchmark_tpu.train.metrics import class_names

    p = Predictor.from_checkpoint(args.checkpoint, model_name=args.model,
                                  max_batch=args.max_batch)
    print(f"[predict] {p.model_name} / {p.task} "
          f"(num_classes={p.bundle.num_classes})", file=sys.stderr)

    t0 = time.perf_counter()
    if args.zinc_split:
        from glearning_benchmark_tpu.data.zinc import load_zinc_split
        graphs = load_zinc_split(args.zinc_root, args.zinc_split)
        out = p.predict_graphs(graphs)
        n = len(graphs)
    elif args.input:
        records = _records_from_file(args.input, p.task)
        if not records:
            sys.exit(f"no parseable records in {args.input!r}")
        out = predict_records(p, records)
        n = len(records)
    else:
        sys.exit("pass --input or --zinc-split")
    dt = time.perf_counter() - t0

    sink = open(args.output, "w") if args.output else sys.stdout
    try:
        if p.task == "zinc":
            for i, v in enumerate(out["pred"]):
                sink.write(json.dumps({"index": i, "pred": round(float(v), 6)}) + "\n")
        else:
            names = class_names(p.task, p.bundle.num_classes)
            for i, (c, pr) in enumerate(zip(out["pred"], out["prob"])):
                sink.write(json.dumps({
                    "index": i, "pred": int(c),
                    "label": names[int(c)] if int(c) < len(names) else str(int(c)),
                    "prob": round(float(pr), 4)}) + "\n")
    finally:
        if args.output:
            sink.close()
    print(f"[predict] {n} examples in {dt:.3f}s "
          f"({n / max(dt, 1e-9):.0f} examples/s, includes compile)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
