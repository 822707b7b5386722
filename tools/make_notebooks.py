#!/usr/bin/env python
"""Build (and execute) the two exploratory notebooks.

The reference ships two .ipynb notebooks (reference notebooks/: IMDB/MUTAG
data exploration; GCN vs GAT on Cora). This framework keeps the runnable
logic in examples/*.py — importable, testable, diff-able — and generates
the notebook form from it here, executing each cell so the committed
.ipynb carries real outputs.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_notebooks.py
"""

from __future__ import annotations

import os
import sys

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "notebooks")

_SETUP = """\
import os, sys
sys.path.insert(0, os.path.abspath(".."))  # repo root
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # notebooks stay off the TPU tunnel
import numpy as np"""


def _nb(cells):
    nb = nbf.v4.new_notebook()
    nb.cells = [nbf.v4.new_markdown_cell(src) if kind == "md"
                else nbf.v4.new_code_cell(src) for kind, src in cells]
    nb.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3",
                                 "language": "python"}
    return nb


def explore_data_nb():
    return _nb([
        ("md", "# Exploring the benchmark's data\n\n"
               "Notebook twin of `examples/explore_data.py` (the reference "
               "ships an exploratory data notebook; reference notebooks/). "
               "Walks the synthetic graph generators, the two token "
               "serializations (IBTT text and SENT trails), vocabulary "
               "construction, and the ZINC molecule corpus."),
        ("code", _SETUP),
        ("md", "## 1. Synthetic graph generators\n\n"
               "Seven algorithms (`er, ba, sbm, sfn, complete, star, path` — "
               "reference docs/synthetic_data.md), deterministic per seed."),
        ("code", """\
from glearning_benchmark_tpu.data import generator as G
for algo in G.ALGORITHMS:
    gs = [G.generate_graph(algo, s) for s in range(50)]
    n = np.array([g.num_nodes for g in gs])
    m = np.array([g.num_edges for g in gs])
    cyc = np.mean([G.has_cycle(g) for g in gs])
    print(f"{algo:9s} nodes {n.min():2d}-{n.max():2d} (mean {n.mean():5.1f}) "
          f"edges mean {m.mean():6.1f}  cyclic {cyc:.0%}")"""),
        ("md", "## 2. Two serializations of one graph\n\n"
               "IBTT renders the edge list as text tokens; the AGTT path "
               "walks Eulerian trails and emits SENT ids."),
        ("code", """\
from glearning_benchmark_tpu.tokenization import TrailTokenizer
from glearning_benchmark_tpu.train.viz import log_graph_examples
g = G.generate_graph("er", 7)
print(log_graph_examples([g], task="cycle_check", num_examples=1))
text = G.cycle_check_records(g)[0]["text"]
print("IBTT text (first 120 chars):")
print(" ", text[:120], "...")
tok = TrailTokenizer()
tok.set_num_nodes(g.num_nodes)
trail = tok(g)
print(f"SENT trail ids (len {len(trail)}):")
print(" ", trail[:30].tolist(), "...")"""),
        ("md", "A rendered example (the confusion-matrix/viz module also "
               "draws graphs, reference metrics.py:256-350):"),
        ("code", """\
from glearning_benchmark_tpu.train.viz import visualize_graph
visualize_graph(G.generate_graph("ba", 3), task="cycle_check",
                title="ba example")"""),
        ("md", "## 3. Vocabulary\n\n"
               "Dynamic vocab over the special tokens, pinned to "
               "first-occurrence order (the reference iterates an unordered "
               "set — deviation #2 in STATUS.md)."),
        ("code", """\
from glearning_benchmark_tpu.tokenization import build_vocab_from_texts
texts = [G.cycle_check_records(G.generate_graph("ba", s))[0]["text"]
         for s in range(50)]
vocab, itos = build_vocab_from_texts(texts)
print(f"vocab size {len(vocab)}; first 15 entries:")
print([itos[i] for i in range(15)])"""),
        ("md", "## 4. ZINC molecules\n\n"
               "Real export when present, deterministic stand-in otherwise "
               "(no network egress in this environment)."),
        ("code", """\
from glearning_benchmark_tpu.data.zinc import load_zinc_split
from glearning_benchmark_tpu.tokenization import tokenize_zinc_molecule
mols = load_zinc_split(split="val", limit=200)
sizes = np.array([m.num_nodes for m in mols])
ys = np.array([m.y for m in mols])
print(f"{len(mols)} molecules; atoms {sizes.min()}-{sizes.max()} "
      f"(mean {sizes.mean():.1f}); target mean {ys.mean():.2f} "
      f"std {ys.std():.2f}")
print("IBTT serialization of molecule 0 (first 140 chars):")
print(" ", tokenize_zinc_molecule(mols[0])[:140], "...")"""),
    ])


def gcn_vs_gat_nb():
    return _nb([
        ("md", "# GCN vs GAT on node classification\n\n"
               "Notebook twin of `examples/gcn_vs_gat.py` (the reference's "
               "second notebook trains 2-layer GCNConv vs GATConv on Cora). "
               "No dataset download is possible here, so the Cora stand-in "
               "is a seeded 4-community SBM \"citation network\" with "
               "bag-of-words-style features and a Cora-style split. Both "
               "models are TPU-idiomatic: dense normalized-adjacency "
               "matmuls (GCN) and dense masked multi-head attention (GAT) "
               "— single [N,N] matmuls on the MXU instead of PyG's "
               "scatter/gather kernels."),
        ("code", _SETUP),
        ("md", "## The citation-network stand-in"),
        ("code", """\
from examples.gcn_vs_gat import make_citation_sbm
x, edges, y, train_mask, val_mask, test_mask = make_citation_sbm()
n = x.shape[0]
print(f"nodes {n} | edges {len(edges)} | features {x.shape[1]} | "
      f"classes {y.max() + 1}")
print(f"split: train {train_mask.sum()} / val {val_mask.sum()} / "
      f"test {test_mask.sum()}")"""),
        ("md", "Dense graph operators, built once and reused every epoch "
               "(the TPU-native replacement for scatter/gather message "
               "passing):"),
        ("code", """\
import jax.numpy as jnp
a = np.zeros((n, n), np.float32)
a[edges[:, 0], edges[:, 1]] = 1.0
a[edges[:, 1], edges[:, 0]] = 1.0
a_self = a + np.eye(n, dtype=np.float32)
d_inv_sqrt = 1.0 / np.sqrt(a_self.sum(1))
a_norm = jnp.asarray(a_self * d_inv_sqrt[:, None] * d_inv_sqrt[None, :])
adj_mask = jnp.asarray(a_self > 0)"""),
        ("md", "## Train both models (full-batch, jitted)"),
        ("code", """\
from examples.gcn_vs_gat import build_models, train_model
EPOCHS = 200
gcn, gat = build_models(x.shape[1], int(y.max()) + 1)
masks = (train_mask, val_mask, test_mask)
r_gcn = train_model("gcn", gcn, a_norm, x, y, masks, EPOCHS)
r_gat = train_model("gat", gat, adj_mask, x, y, masks, EPOCHS)"""),
        ("md", "## Comparison"),
        ("code", """\
print(f"{'model':6s} {'train':>8s} {'val':>8s} {'test':>8s}")
for nm, r in (("GCN", r_gcn), ("GAT", r_gat)):
    print(f"{nm:6s} {r['train']:8.4f} {r['val']:8.4f} {r['test']:8.4f}")"""),
        ("code", """\
%matplotlib inline
import matplotlib.pyplot as plt
fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
for nm, r, c in (("GCN", r_gcn, "tab:blue"), ("GAT", r_gat, "tab:red")):
    ax1.plot(r["losses"], color=c, label=nm, linewidth=2)
    ax2.plot(r["val_accs"], color=c, label=nm, linewidth=2)
ax1.set_xlabel("Epoch"); ax1.set_ylabel("Training loss")
ax2.set_xlabel("Epoch"); ax2.set_ylabel("Validation accuracy")
for ax in (ax1, ax2):
    ax.grid(True, alpha=0.3); ax.legend()
fig"""),
    ])


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    execute = "--no-exec" not in sys.argv
    for name, build in (("explore_data", explore_data_nb),
                        ("gcn_vs_gat", gcn_vs_gat_nb)):
        nb = build()
        if execute:
            from nbclient import NotebookClient
            NotebookClient(nb, timeout=900,
                           resources={"metadata": {"path": OUT}}).execute()
        path = os.path.join(OUT, f"{name}.ipynb")
        with open(path, "w") as f:
            nbf.write(nb, f)
        print(f"wrote {path}" + (" (executed)" if execute else ""))


if __name__ == "__main__":
    main()
