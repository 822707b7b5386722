#!/usr/bin/env python
"""Export the real PyG ZINC dataset to the framework's .npz format.

Run in an environment WITH torch_geometric + network access:

    python tools/export_zinc.py --root ./data/ZINC --subset

Produces data/ZINC/zinc_{train,val,test}.npz, which
glearning_benchmark_tpu.data.zinc.load_zinc_split picks up automatically
(replacing the deterministic stand-in corpus used in zero-egress
environments).
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data/ZINC")
    ap.add_argument("--subset", action="store_true", default=True)
    args = ap.parse_args()

    from torch_geometric.datasets import ZINC  # requires network on first run

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from glearning_benchmark_tpu.data.graphs import Graph
    from glearning_benchmark_tpu.data.zinc import save_zinc_npz

    for split in ("train", "val", "test"):
        ds = ZINC(root=args.root, subset=args.subset, split=split)
        graphs = []
        for data in ds:
            e = data.edge_index.numpy()
            graphs.append(Graph(
                edges=np.stack([e[0], e[1]], axis=1).astype(np.int32),
                num_nodes=int(data.num_nodes), y=float(data.y),
                node_labels=data.x.flatten().numpy().astype(np.int32),
                edge_labels=data.edge_attr.flatten().numpy().astype(np.int32)))
        save_zinc_npz(f"{args.root}/zinc_{split}.npz", graphs)
        print(f"wrote zinc_{split}.npz ({len(graphs)} molecules)")


if __name__ == "__main__":
    main()
