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

    for split in ("train", "val", "test"):
        ds = ZINC(root=args.root, subset=args.subset, split=split)
        node_off = [0]
        edge_off = [0]
        atoms, src, dst, bond, ys = [], [], [], [], []
        for data in ds:
            atoms.append(data.x.flatten().numpy().astype(np.int32))
            e = data.edge_index.numpy()
            src.append(e[0].astype(np.int32))
            dst.append(e[1].astype(np.int32))
            bond.append(data.edge_attr.flatten().numpy().astype(np.int32))
            ys.append(float(data.y))
            node_off.append(node_off[-1] + data.num_nodes)
            edge_off.append(edge_off[-1] + e.shape[1])
        np.savez_compressed(
            f"{args.root}/zinc_{split}.npz",
            node_offsets=np.asarray(node_off, dtype=np.int64),
            edge_offsets=np.asarray(edge_off, dtype=np.int64),
            atom_types=np.concatenate(atoms),
            edge_src=np.concatenate(src),
            edge_dst=np.concatenate(dst),
            bond_types=np.concatenate(bond),
            y=np.asarray(ys, dtype=np.float64),
        )
        print(f"wrote zinc_{split}.npz ({len(ys)} molecules)")


if __name__ == "__main__":
    main()
