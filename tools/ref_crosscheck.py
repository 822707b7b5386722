#!/usr/bin/env python
"""Train the REFERENCE's own PyTorch ibtt model on OUR corpus (CPU).

Settles VERDICT r1 weakness #1 with the reference's own code: ibtt
shortest_path at reference hyperparameters reaches ~0.64 val acc on our
default 10-50-node corpus and ~1.0 on the small (10-20-node) bucket
(ABLATIONS.json). If that is an artifact of our JAX rebuild, the
reference implementation should beat it on the same data; if it is
corpus-size-intrinsic, the reference implementation plateaus at the same
level. This tool runs the actual reference stack — SimpleTransformer,
TokenDataset, collate, build_vocab_from_texts, AdamW + clip(1.0) + CE,
all imported read-only from /root/reference (trainer/train_ibtt.py:24,
graph_data_loader/data_loader.py:451-497) — on examples loaded by OUR
loader with the exact ibtt-sp campaign arguments (tools/run_benchmarks.py
RUNS_FULL ibtt-sp; seed 0, num_graphs 500, num_pairs_per_graph 10).

    python tools/ref_crosscheck.py [--corpus default|small|both]
                                   [--epochs 150] [--out REF_CROSSCHECK.json]

CPU-only torch; safe to run alongside nothing (no TPU claim needed, but
honor the single-client rule anyway: PALLAS_AXON_POOL_IPS= python ...).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

CORPORA = {
    # mirror tools/ablate_sp.py SP_BASE + tools/run_benchmarks.py ibtt-sp
    "default": {"root": "data/graph-token", "size_buckets": None},
    "small": {"root": "data/graph-token-small", "size_buckets": ["small"]},
    "medium": {"root": "data/graph-token-medium", "size_buckets": ["medium"]},
}

HP = {  # configs/ibtt_graph_token.yaml model/train sections (reference HPs)
    "d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 128, "p_drop": 0.1,
    "max_pos": 600, "max_len": 600, "batch_size": 128, "lr": 1e-3,
    "weight_decay": 1e-4, "seed": 0,
}


def _import_reference():
    if "wandb" not in sys.modules:  # reference imports it unconditionally
        sys.modules["wandb"] = types.ModuleType("wandb")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import trainer.train_ibtt as ref_ibtt
    import graph_data_loader.data_loader as ref_dl
    return ref_ibtt, ref_dl


def _load_examples(corpus: str):
    """Same examples the JAX ibtt-sp run trains on (train/datasets.py)."""
    from glearning_benchmark_tpu.data.generator import generate_corpus
    from glearning_benchmark_tpu.data.loader import (
        load_examples_multi_algorithm)
    spec = CORPORA[corpus]
    root = spec["root"]
    # generate_corpus is incremental per (task, algo) at the current
    # GENERATOR_VERSION — always call it (a root that only ever ran
    # cycle_check would otherwise yield 0 shortest_path examples)
    generate_corpus(root, tasks=["cycle_check", "shortest_path"],
                    number_of_graphs=500, seed=1234,
                    size_buckets=spec["size_buckets"])
    kw = dict(use_split_tasks_dirs=True, seed=HP["seed"], num_graphs=500,
              num_pairs_per_graph=10)
    return (load_examples_multi_algorithm(root, "shortest_path", ["path"],
                                          "train", **kw),
            load_examples_multi_algorithm(root, "shortest_path", ["path"],
                                          "val", **kw))


def run_one(corpus: str, epochs: int) -> dict:
    import torch
    from torch.utils.data import DataLoader

    ref_ibtt, ref_dl = _import_reference()
    train_ex, val_ex = _load_examples(corpus)
    print(f"[{corpus}] {len(train_ex)} train / {len(val_ex)} val examples")

    torch.manual_seed(HP["seed"])
    vocab, _ = ref_dl.build_vocab_from_texts([e["text"] for e in train_ex])
    ds_tr = ref_dl.TokenDataset(train_ex, vocab, max_len=HP["max_len"])
    ds_va = ref_dl.TokenDataset(val_ex, vocab, max_len=HP["max_len"])
    pad = vocab["<pad>"]
    coll = lambda b: ref_dl.collate(b, pad)  # noqa: E731
    dl_tr = DataLoader(ds_tr, batch_size=HP["batch_size"], shuffle=True,
                       collate_fn=coll)
    dl_va = DataLoader(ds_va, batch_size=HP["batch_size"], shuffle=False,
                       collate_fn=coll)

    model = ref_ibtt.SimpleTransformer(
        vocab_size=len(vocab), d_model=HP["d_model"], nhead=HP["nhead"],
        nlayers=HP["nlayers"], d_ff=HP["d_ff"], p_drop=HP["p_drop"],
        max_pos=HP["max_pos"], num_classes=7, use_query_nodes=True,
        task="shortest_path")
    opt = torch.optim.AdamW(model.parameters(), lr=HP["lr"],
                            weight_decay=HP["weight_decay"])
    crit = torch.nn.CrossEntropyLoss()

    @torch.no_grad()
    def val_acc() -> float:
        model.eval()
        hit = n = 0
        for X, A, Y in dl_va:
            pred = model(X, A, vocab=vocab).argmax(-1)
            hit += int((pred == Y).sum())
            n += len(Y)
        return hit / max(n, 1)

    best, hist, t0 = 0.0, [], time.time()
    for ep in range(1, epochs + 1):
        model.train()
        for X, A, Y in dl_tr:
            opt.zero_grad(set_to_none=True)
            loss = crit(model(X, A, vocab=vocab), Y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        acc = val_acc()
        best = max(best, acc)
        hist.append(round(acc, 4))
        print(f"[{corpus}] epoch {ep:3d} val_acc {acc:.4f} "
              f"(best {best:.4f}, {time.time() - t0:.0f}s)", flush=True)
    return {"corpus": corpus, "epochs": epochs, "best_val_acc": best,
            "val_acc_history": hist, "train_examples": len(train_ex),
            "val_examples": len(val_ex), "wall_s": round(time.time() - t0, 1)}


def harvest(log_path: str, corpus: str, out: str) -> None:
    """Recover a partial run's per-epoch history from its log (the run only
    writes JSON at completion; a wall-clock-killed run still leaves every
    epoch line in the log)."""
    import re
    pat = re.compile(r"epoch\s+(\d+) val_acc ([0-9.]+)")
    hist = []
    for line in open(log_path):
        m = pat.search(line)
        if m:
            hist.append((int(m.group(1)), float(m.group(2))))
    hist.sort()
    accs = [a for _, a in hist]
    results = json.load(open(out)) if os.path.exists(out) else {}
    results[corpus] = {"corpus": corpus, "epochs": len(accs),
                       "best_val_acc": max(accs) if accs else 0.0,
                       "val_acc_history": accs, "partial": True}
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[harvest] {corpus}: {len(accs)} epochs, "
          f"best {max(accs) if accs else 0:.4f} -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="both",
                    choices=["default", "small", "medium", "both"])
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--out", default="REF_CROSSCHECK.json")
    ap.add_argument("--harvest", default=None, metavar="LOG",
                    help="parse a (possibly partial) run log into --out "
                         "instead of training")
    args = ap.parse_args()
    if args.harvest:
        harvest(args.harvest, args.corpus, args.out)
        return

    import torch
    torch.set_num_threads(os.cpu_count() or 4)

    names = ["default", "small"] if args.corpus == "both" else [args.corpus]
    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    for name in names:
        results[name] = run_one(name, args.epochs)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[done] {name}: best_val {results[name]['best_val_acc']:.4f}"
              f" -> {args.out}")


if __name__ == "__main__":
    main()
