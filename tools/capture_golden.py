#!/usr/bin/env python
"""Capture golden conformance corpora from the ACTUAL reference code.

Runs the reference's pure-Python modules (read-only, torch_geometric
stubbed) on deterministic inputs and freezes their outputs under
tests/golden/. tests/test_golden.py then asserts our implementations match
these bytes forever — independent of the reference tree being mounted.
"""

from __future__ import annotations

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def main() -> None:
    assert os.path.isdir(REF), "reference tree required to capture goldens"
    import torch

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_data = types.ModuleType("torch_geometric.datasets")
        tg_data.ZINC = object
        tg.datasets = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.datasets"] = tg_data
    sys.path.insert(0, REF)
    import graph_data_loader.data_loader as ref_dl
    import graph_data_loader.zinc_dataset_indexbase as ref_zi
    import graph_data_loader.zinc_vocab as ref_zv

    from glearning_benchmark_tpu.data import generator as G
    from glearning_benchmark_tpu.data.zinc import load_zinc_split

    golden = {}

    # 1. synthetic texts -> reference vocab + TokenDataset encodings
    texts = []
    for algo in ("er", "ba", "sbm", "path"):
        for seed in range(4):
            g = G.generate_graph(algo, seed)
            texts.append(G.cycle_check_records(g)[0]["text"])
    for seed in range(2):
        g = G.generate_graph("er", 50 + seed)
        texts.extend(r["text"] for r in G.shortest_path_records(g, max_pairs=3, seed=seed))
    vocab, _ = ref_dl.build_vocab_from_texts(texts)
    ds = ref_dl.TokenDataset([{"text": t, "label": 1} for t in texts], vocab,
                             max_len=600, require_label=False)
    golden["synthetic_texts"] = texts
    golden["synthetic_vocab"] = vocab
    golden["synthetic_encodings"] = [ds[i][0].tolist() for i in range(len(ds))]

    # 2. ZINC molecule serializations through the reference tokenizer
    zds = ref_zi.ZINCTokenizationDataset.__new__(ref_zi.ZINCTokenizationDataset)
    zds.max_len = 1024
    mols = load_zinc_split(split="val", limit=50)
    zrecs = []
    for m in mols:
        shim = types.SimpleNamespace(
            x=torch.tensor(m.node_labels.reshape(-1, 1).tolist()),
            edge_index=torch.tensor(m.edges.T.tolist()),
            edge_attr=torch.tensor(m.edge_labels.tolist()))
        zrecs.append({
            "num_nodes": m.num_nodes,
            "edges": m.edges.tolist(),
            "node_labels": m.node_labels.tolist(),
            "edge_labels": m.edge_labels.tolist(),
            "y": float(m.y),
            "text": zds.tokenize_molecule(shim, float(m.y)),
        })
    golden["zinc_molecules"] = zrecs

    # 3. fixed vocab table
    fv, _ = ref_zv.build_fixed_zinc_vocab()
    golden["fixed_zinc_vocab"] = fv

    out = os.path.join(REPO, "tests", "golden")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "reference_golden.json"), "w") as f:
        json.dump(golden, f)
    print(f"captured {len(texts)} texts, {len(zrecs)} molecules -> "
          f"{out}/reference_golden.json")


if __name__ == "__main__":
    main()
