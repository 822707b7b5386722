"""Immutable array-based graph structures (replaces PyG ``Data``).

The reference stores graphs as PyG ``Data(x, edge_index, y, num_nodes,
query_u, query_v)`` objects and batches them into one big block-diagonal
graph (reference: graph_data_loader/graph_token_dataset_nativegraph.py:384-410,
torch_geometric DataLoader). On TPU, ragged block-diagonal graphs force
dynamic shapes, so we instead batch graphs into *padded dense* arrays:

- ``nodes``:  [B, N_max] node-feature ints (or float features [B, N_max, F])
- ``adj``:    [B, N_max, N_max] dense adjacency — message passing becomes a
  batched matmul on the MXU instead of scatter/gather (graphs here have
  N <= ~64 nodes, so dense adjacency is both faster and simpler than CSR)
- ``node_mask``: [B, N_max] validity mask

Edge lists are kept alongside for tokenizers that need edge order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class Graph:
    """A single graph.

    edges: int32 [E, 2] — undirected edges stored once (u, v) in emission
        order (the order the source text / generator listed them).
    num_nodes: int
    y: label (int for classification, float for regression)
    node_labels: optional int32 [N] (e.g. ZINC atom types)
    edge_labels: optional int32 [E] (e.g. ZINC bond types, 1-based)
    query_u/query_v: optional ints (shortest_path query pair)
    """

    edges: np.ndarray
    num_nodes: int
    y: float | int
    node_labels: Optional[np.ndarray] = None
    edge_labels: Optional[np.ndarray] = None
    query_u: Optional[int] = None
    query_v: Optional[int] = None

    @property
    def num_edges(self) -> int:
        return int(self.edges.shape[0])

    def degrees(self) -> np.ndarray:
        d = np.zeros(self.num_nodes, dtype=np.int32)
        if self.num_edges:
            np.add.at(d, self.edges[:, 0], 1)
            np.add.at(d, self.edges[:, 1], 1)
        return d

    def adjacency(self, n_pad: Optional[int] = None) -> np.ndarray:
        n = n_pad or self.num_nodes
        a = np.zeros((n, n), dtype=np.float32)
        if self.num_edges:
            u, v = self.edges[:, 0], self.edges[:, 1]
            a[u, v] = 1.0
            a[v, u] = 1.0
        return a


class GraphCorpus(list):
    """A list of :class:`Graph` that also carries the corpus's flat
    struct-of-arrays form (``flat``: the dict produced by
    ``tokenization.ibtt_fast.flatten_zinc_corpus``).

    The TPU-native corpus storage IS the flat form — one concatenated array
    per field plus offsets, the same collated layout PyG's
    ``InMemoryDataset`` uses on the reference side
    (graph_token_dataset_nativegraph.py:418 ``self.collate``) — and the
    per-item ``Graph`` objects are adapter views for per-molecule consumers.
    ``flatten_zinc_corpus`` reuses ``flat`` (after a spot-check) instead of
    re-concatenating 10k small arrays. Plain-list slices of a corpus drop
    the attribute and fall back to the concatenating path.

    Contract: the corpus is immutable after load — Graph itself is a frozen
    dataclass, and replacing a list element desyncs it from ``flat`` (the
    spot-check samples eight indices and catches truncation/reorder and
    most replacements; to derive a modified corpus, build a plain list).
    """

    flat: Optional[dict] = None


@dataclass
class GraphBatch:
    """Dense padded batch of graphs (all arrays are fixed-shape)."""

    adj: np.ndarray          # [B, N, N] float32 symmetric adjacency
    node_feat: np.ndarray    # [B, N, F] float32 node features
    node_mask: np.ndarray    # [B, N] bool
    y: np.ndarray            # [B] int32 or float32
    num_nodes: np.ndarray    # [B] int32
    query_u: Optional[np.ndarray] = None  # [B] int32
    query_v: Optional[np.ndarray] = None  # [B] int32
    eadj: Optional[np.ndarray] = None     # [B, N, N] uint8 edge types (0 = none)

    @property
    def batch_size(self) -> int:
        return int(self.adj.shape[0])


def pad_graphs(graphs: Sequence[Graph], n_max: Optional[int] = None) -> int:
    m = max((g.num_nodes for g in graphs), default=1)
    if n_max is not None:
        if m > n_max:
            raise ValueError(f"graph with {m} nodes exceeds pad size {n_max}")
        return n_max
    return m


def batch_graphs(
    graphs: Sequence[Graph],
    n_max: Optional[int] = None,
    node_feat_mode: str = "const",
    query_encoding: bool = False,
    label_dtype=np.int32,
    edge_types: bool = False,
) -> GraphBatch:
    """Batch graphs to dense padded arrays.

    node_feat_mode:
      - "const": x = ones [N,1] (reference nativegraph.py:396)
      - "labels": one-feature int node labels as float [N,1] (ZINC atoms)
    query_encoding: append two binary columns marking (source, target)
      (reference: add_query_encoding_to_features, nativegraph.py:16-31).
    edge_types: also emit ``eadj`` [B,N,N] uint8 holding each edge's label
      (ZINC bond types 1-4, 0 = no edge) for edge-featured message passing
      (GINE); graphs without ``edge_labels`` contribute type 1 edges.
    """
    b = len(graphs)
    n = pad_graphs(graphs, n_max)
    feat_dim = 1 + (2 if query_encoding else 0)
    adj = np.zeros((b, n, n), dtype=np.float32)
    eadj = np.zeros((b, n, n), dtype=np.uint8) if edge_types else None
    x = np.zeros((b, n, feat_dim), dtype=np.float32)
    mask = np.zeros((b, n), dtype=bool)
    y = np.zeros((b,), dtype=label_dtype)
    nn = np.zeros((b,), dtype=np.int32)
    has_query = any(g.query_u is not None for g in graphs)
    qu = np.zeros((b,), dtype=np.int32) if has_query else None
    qv = np.zeros((b,), dtype=np.int32) if has_query else None

    for i, g in enumerate(graphs):
        k = g.num_nodes
        if g.num_edges:
            u, v = g.edges[:, 0], g.edges[:, 1]
            adj[i, u, v] = 1.0
            adj[i, v, u] = 1.0
            if eadj is not None:
                et = (g.edge_labels.astype(np.uint8)
                      if g.edge_labels is not None
                      else np.ones(len(u), dtype=np.uint8))
                eadj[i, u, v] = et
                eadj[i, v, u] = et
        if node_feat_mode == "labels" and g.node_labels is not None:
            x[i, :k, 0] = g.node_labels.astype(np.float32)
        else:
            x[i, :k, 0] = 1.0
        mask[i, :k] = True
        y[i] = g.y
        nn[i] = k
        if has_query:
            qu[i] = -1 if g.query_u is None else g.query_u
            qv[i] = -1 if g.query_v is None else g.query_v
            if query_encoding and g.query_u is not None:
                x[i, g.query_u, 1] = 1.0
                x[i, g.query_v, 2] = 1.0

    return GraphBatch(adj=adj, node_feat=x, node_mask=mask, y=y, num_nodes=nn,
                      query_u=qu, query_v=qv, eadj=eadj)
