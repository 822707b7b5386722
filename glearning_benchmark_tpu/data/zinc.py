"""ZINC molecular graphs.

The reference loads ZINC-12K through ``torch_geometric.datasets.ZINC`` (a
network download, reference: graph_data_loader/zinc_dataset_indexbase.py:79).
This environment has no network egress, so this module provides:

1. ``load_zinc_split(root, split)`` — loads real ZINC if an ``.npz`` export is
   present at ``<root>/zinc_<split>.npz`` (arrays: ``node_offsets``,
   ``edge_offsets``, ``atom_types``, ``edge_src``, ``edge_dst``,
   ``bond_types``, ``y``), matching PyG's tensor semantics: node features are
   atom-type ints 0-8, edge_attr bond ints 1-4, edge_index directed with both
   orientations of every bond.
2. A deterministic molecular *stand-in* generator with ZINC-like statistics
   (split sizes 10000/1000/1000, 9 atom types with realistic frequencies,
   tree + ring topology, 4 bond types, a smooth structure-dependent
   regression target), used when no export exists. All downstream machinery
   (tokenizers, vocab, models, metrics) is exercised identically either way.

Graphs are returned with *directed duplicated* edges in (src-sorted) order —
the exact shape PyG's ZINC exposes — because IBTT tokenization order depends
on it (reference: zinc_dataset_indexbase.py:176-184 dedups the directed list
to canonical pairs in first-occurrence order).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from .graphs import Graph, GraphCorpus

ZINC_NUM_ATOM_TYPES = 9   # C N O F P S Cl Br I (reference zinc_vocab.py:20)
ZINC_NUM_BOND_TYPES = 4   # single double triple aromatic (1-based ids)

_ATOM_SYMBOLS = ["C", "N", "O", "F", "P", "S", "Cl", "Br", "I"]
_BOND_NAMES = {1: "single", 2: "double", 3: "triple", 4: "aromatic"}

# ZINC-like atom frequency (heavily carbon-dominated)
_ATOM_PROBS = np.array([0.72, 0.11, 0.10, 0.02, 0.002, 0.025, 0.015, 0.006, 0.002])
_ATOM_PROBS = _ATOM_PROBS / _ATOM_PROBS.sum()
_BOND_PROBS = np.array([0.68, 0.20, 0.02, 0.10])  # single/double/triple/aromatic

_SPLIT_SIZES = {"train": 10000, "val": 1000, "test": 1000}
_SPLIT_SEED = {"train": 0, "val": 1, "test": 2}


def get_zinc_num_types():
    """(num_node_types, num_edge_types) = (9, 4) (reference:
    zinc_dataset_autograph.py:76-100)."""
    return ZINC_NUM_ATOM_TYPES, ZINC_NUM_BOND_TYPES


def zinc_atom_symbol(idx: int) -> str:
    return _ATOM_SYMBOLS[idx] if 0 <= idx < len(_ATOM_SYMBOLS) else "X"


def zinc_bond_name(idx: int) -> str:
    return _BOND_NAMES.get(int(idx), "unknown")


def _synth_molecule(seed: int) -> Graph:
    rng = np.random.default_rng(seed)
    n = int(np.clip(round(rng.normal(23, 5)), 9, 37))
    atom = rng.choice(ZINC_NUM_ATOM_TYPES, size=n, p=_ATOM_PROBS).astype(np.int32)

    # random tree with valence cap 4
    deg = np.zeros(n, dtype=np.int32)
    und_edges: List[tuple] = []
    for i in range(1, n):
        cands = np.flatnonzero(deg[:i] < 4)
        if cands.size == 0:
            cands = np.arange(i)
        j = int(cands[rng.integers(0, cands.size)])
        und_edges.append((j, i))
        deg[j] += 1
        deg[i] += 1

    # ring closures: connect nodes at moderate index distance
    n_rings = int(rng.integers(0, 4))
    existing = {tuple(sorted(e)) for e in und_edges}
    for _ in range(n_rings):
        a = int(rng.integers(0, n - 5))
        b = a + int(rng.integers(4, min(7, n - a)))
        key = (a, b)
        if key not in existing and deg[a] < 4 and deg[b] < 4:
            existing.add(key)
            und_edges.append(key)
            deg[a] += 1
            deg[b] += 1

    und = np.asarray(und_edges, dtype=np.int32)
    bond = rng.choice(np.arange(1, 5, dtype=np.int32), size=und.shape[0], p=_BOND_PROBS)

    # directed duplicated edges sorted by (src, dst), PyG-style
    src = np.concatenate([und[:, 0], und[:, 1]])
    dst = np.concatenate([und[:, 1], und[:, 0]])
    bb = np.concatenate([bond, bond])
    order = np.lexsort((dst, src))
    edges = np.stack([src[order], dst[order]], axis=1).astype(np.int32)
    bb = bb[order].astype(np.int32)

    # deterministic structure-dependent target ("constrained solubility"-
    # like), roughly in [-4, 4]. Composition/topology terms PLUS nonlinear
    # substructure-interaction terms, so a linear readout of atom counts
    # cannot solve it — models must use the graph structure (real ZINC gives
    # MAE 0.46-0.66; the round-1 quasi-linear stand-in bottomed out at
    # 0.02-0.2, exercising the pipeline but not the models).
    counts = np.bincount(atom, minlength=ZINC_NUM_ATOM_TYPES).astype(np.float64)
    ring_count = len(und_edges) - (n - 1)
    # per-bond-type counts over undirected bonds
    bond_counts = np.bincount(bond, minlength=5).astype(np.float64)
    # local-structure terms: hetero-hetero adjacency (both endpoints
    # non-carbon) and degree of each oxygen/nitrogen
    hetero = atom != 0
    hh_bonds = float(np.sum(hetero[und[:, 0]] & hetero[und[:, 1]]))
    o_deg = float(deg[atom == 2].sum()) if counts[2] else 0.0
    y = (0.11 * counts[0] - 0.25 * counts[2] - 0.20 * counts[1]
         + 0.15 * counts[5] + 0.08 * counts[3]
         + 0.35 * ring_count - 0.055 * n
         + 0.02 * float((deg ** 2).sum()) / n - 0.8
         # nonlinear interactions
         + 0.9 * np.tanh(0.35 * counts[1] * counts[2] / max(n, 1))  # N x O
         + 0.6 * np.sin(1.1 * ring_count + 0.3 * bond_counts[4])    # ring/aromatic phase
         - 0.7 * hh_bonds / max(len(und_edges), 1) * ring_count      # hetero bonds in rings
         + 0.5 * np.tanh(0.2 * o_deg - 0.1 * bond_counts[2] ** 2)    # O valence vs double bonds
         + 0.45 * ((int(counts[3]) > 0) ^ (ring_count % 2 == 1)))    # parity term
    return Graph(edges=edges, num_nodes=n, y=float(round(y, 4)),
                 node_labels=atom, edge_labels=bb)


def save_zinc_npz(path: str, graphs: List[Graph]) -> None:
    """Write graphs in the export schema ``_load_npz`` consumes (the same
    writer tools/export_zinc.py uses on the real PyG dataset, so a real
    export and this round-trip path are schema-identical by construction)."""
    node_off = np.zeros(len(graphs) + 1, dtype=np.int64)
    edge_off = np.zeros(len(graphs) + 1, dtype=np.int64)
    for i, g in enumerate(graphs):
        node_off[i + 1] = node_off[i] + g.num_nodes
        edge_off[i + 1] = edge_off[i] + len(g.edges)
    np.savez_compressed(
        path,
        node_offsets=node_off,
        edge_offsets=edge_off,
        atom_types=np.concatenate([g.node_labels for g in graphs]).astype(np.int32),
        edge_src=np.concatenate([g.edges[:, 0] for g in graphs]).astype(np.int32),
        edge_dst=np.concatenate([g.edges[:, 1] for g in graphs]).astype(np.int32),
        bond_types=np.concatenate([g.edge_labels for g in graphs]).astype(np.int32),
        y=np.asarray([g.y for g in graphs], dtype=np.float64),
    )


def _load_npz(path: str):
    """Returns (graphs, flat): per-molecule Graph views plus the corpus's
    flat struct-of-arrays form, built directly from the export arrays
    (the export schema is already flat — no per-molecule round-trip)."""
    z = np.load(path)
    node_off, edge_off = z["node_offsets"], z["edge_offsets"]
    atom, src, dst, bond, y = z["atom_types"], z["edge_src"], z["edge_dst"], z["bond_types"], z["y"]
    graphs: List[Graph] = []
    for i in range(len(node_off) - 1):
        ns, ne = int(node_off[i]), int(node_off[i + 1])
        es, ee = int(edge_off[i]), int(edge_off[i + 1])
        edges = np.stack([src[es:ee], dst[es:ee]], axis=1).astype(np.int32)
        graphs.append(Graph(
            edges=edges, num_nodes=ne - ns, y=float(y[i]),
            node_labels=atom[ns:ne].astype(np.int32),
            edge_labels=bond[es:ee].astype(np.int32)))
    node_off = node_off.astype(np.int64)
    edge_off = edge_off.astype(np.int64)
    # canonical flat dtypes = the native-kernel dtypes (int32 fields, int64
    # offsets — same contract as tokenization.ibtt_fast.flatten_zinc_corpus),
    # so the export's own int32 arrays flow through zero-copy
    flat = {
        "n_nodes": np.diff(node_off).astype(np.int32),
        "n_edges": np.diff(edge_off).astype(np.int32),
        "node_off": node_off, "edge_off": edge_off,
        "atoms": np.ascontiguousarray(atom, dtype=np.int32),
        "src": np.ascontiguousarray(src, dtype=np.int32),
        "dst": np.ascontiguousarray(dst, dtype=np.int32),
        "bond": np.ascontiguousarray(bond, dtype=np.int32),
        "y": y.astype(np.float64),
    }
    return graphs, flat


_warned = False


def load_zinc_split(root: str = "./data/ZINC", split: str = "train",
                    subset: bool = True, limit: int | None = None) -> GraphCorpus:
    """Load one ZINC split (real export if present, deterministic stand-in
    otherwise). Returns a :class:`GraphCorpus` carrying the flat
    struct-of-arrays form alongside the per-molecule Graph views."""
    global _warned
    if split not in _SPLIT_SIZES:
        raise ValueError(f"unknown split {split!r}")
    npz = os.path.join(root, f"zinc_{split}.npz")
    flat = None
    if os.path.isfile(npz):
        graphs, flat = _load_npz(npz)
    else:
        if not _warned:
            print("[zinc] no real ZINC export found; using deterministic "
                  "ZINC-like stand-in corpus (no network egress available)")
            _warned = True
        count = _SPLIT_SIZES[split]
        if limit is not None:
            count = min(count, limit)
        base = _SPLIT_SEED[split] * 1_000_000 + 777
        graphs = [_synth_molecule(base + i) for i in range(count)]
    if limit is not None and len(graphs) > limit:
        graphs, flat = graphs[:limit], None
    corpus = GraphCorpus(graphs)
    if flat is None:
        from ..tokenization.ibtt_fast import flatten_zinc_corpus
        flat = flatten_zinc_corpus(graphs)
    corpus.flat = flat
    return corpus
