#!/usr/bin/env python
"""Data exploration walkthrough (the reference ships two exploratory
notebooks; this is the script equivalent — run top to bottom, read stdout,
optionally write figures).

    python examples/explore_data.py [--figures out_dir]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--figures", default=None)
    args = ap.parse_args()

    from glearning_benchmark_tpu.data import generator as G
    from glearning_benchmark_tpu.data.zinc import load_zinc_split
    from glearning_benchmark_tpu.tokenization import (
        TrailTokenizer, build_vocab_from_texts, tokenize_zinc_molecule)
    from glearning_benchmark_tpu.train.viz import log_graph_examples

    print("=" * 80)
    print("1. Synthetic graph generators")
    print("=" * 80)
    for algo in G.ALGORITHMS:
        gs = [G.generate_graph(algo, s) for s in range(50)]
        n = np.array([g.num_nodes for g in gs])
        m = np.array([g.num_edges for g in gs])
        cyc = np.mean([G.has_cycle(g) for g in gs])
        print(f"  {algo:9s} nodes {n.min():2d}-{n.max():2d} (mean {n.mean():5.1f}) "
              f"edges mean {m.mean():6.1f}  cyclic {cyc:.0%}")

    print()
    print("=" * 80)
    print("2. Serializations of one graph")
    print("=" * 80)
    g = G.generate_graph("er", 7)
    print(log_graph_examples([g], task="cycle_check", num_examples=1))
    text = G.cycle_check_records(g)[0]["text"]
    print("IBTT text (first 120 chars):")
    print(" ", text[:120], "...")
    tok = TrailTokenizer()
    tok.set_num_nodes(g.num_nodes)
    trail = tok(g)
    print(f"SENT trail ids (len {len(trail)}):")
    print(" ", trail[:30].tolist(), "...")

    print()
    print("=" * 80)
    print("3. Vocabulary")
    print("=" * 80)
    texts = [G.cycle_check_records(G.generate_graph("ba", s))[0]["text"]
             for s in range(50)]
    vocab, itos = build_vocab_from_texts(texts)
    print(f"  vocab size {len(vocab)}; first 15 entries: "
          f"{[itos[i] for i in range(15)]}")

    print()
    print("=" * 80)
    print("4. ZINC molecules")
    print("=" * 80)
    mols = load_zinc_split(split="val", limit=200)
    sizes = np.array([m.num_nodes for m in mols])
    ys = np.array([m.y for m in mols])
    print(f"  {len(mols)} molecules; atoms {sizes.min()}-{sizes.max()} "
          f"(mean {sizes.mean():.1f}); target mean {ys.mean():.2f} std {ys.std():.2f}")
    print("  IBTT serialization of molecule 0 (first 140 chars):")
    print("  ", tokenize_zinc_molecule(mols[0])[:140], "...")

    if args.figures:
        os.makedirs(args.figures, exist_ok=True)
        from glearning_benchmark_tpu.train.viz import visualize_graph
        for algo in ("er", "ba", "star"):
            img = visualize_graph(G.generate_graph(algo, 3), task="cycle_check",
                                  title=f"{algo} example")
            img.save(os.path.join(args.figures, f"{algo}_example.png"))
        print(f"\nwrote figures to {args.figures}/")


if __name__ == "__main__":
    main()
