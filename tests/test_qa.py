"""QA suite: the reference's standalone analysis-script ideas as real tests
(reference test/README.md — data consistency, baseline sanity, untrained
model ≈ chance, distribution characterization)."""

import jax
import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.graphs import batch_graphs
from glearning_benchmark_tpu.data.text_grammar import text_record_to_graph
from glearning_benchmark_tpu.models import MPNN


def _graphs(algos=("ba", "sbm"), n=25):
    out = []
    for a in algos:
        for s in range(n):
            g = G.generate_graph(a, s)
            out.append(g)
    return out


def test_graph_vs_sequence_consistency():
    """Graph-native parse of the serialized text matches the source graph
    (the reference's graph_seq_test idea: representation consistency)."""
    for g in _graphs(n=10):
        rec = G.cycle_check_records(g)[0]
        gg = text_record_to_graph(rec["text"], task="cycle_check")
        assert gg.num_nodes == g.num_nodes
        assert {tuple(sorted(map(int, e))) for e in gg.edges} == \
               {tuple(sorted(map(int, e))) for e in g.edges}
        assert gg.y == int(G.has_cycle(g))


def test_label_balance_not_degenerate():
    labels = [int(G.has_cycle(g)) for g in _graphs(n=40)]
    frac = np.mean(labels)
    assert 0.05 < frac < 0.98


def test_majority_baseline_beats_nothing():
    """Majority/random baselines are computable and bounded (reference
    train_performance_test.py:77-143)."""
    labels = np.array([int(G.has_cycle(g)) for g in _graphs(n=40)])
    majority_acc = max(labels.mean(), 1 - labels.mean())
    assert 0.5 <= majority_acc < 1.0


def test_untrained_mpnn_near_chance():
    """An untrained model's accuracy should be near chance on balanced data
    (reference train_performance_test.py:267-339)."""
    graphs = _graphs(n=30)
    labels = np.array([int(G.has_cycle(g)) for g in graphs])
    gb = batch_graphs(graphs)
    model = MPNN(in_dim=1, hidden_dim=16, num_layers=2, num_classes=2)
    variables = model.init(jax.random.PRNGKey(123), gb.node_feat, gb.adj, gb.node_mask)
    logits = np.asarray(model.apply(variables, gb.node_feat, gb.adj, gb.node_mask))
    preds = logits.argmax(-1)
    acc = (preds == labels).mean()
    chance = max(labels.mean(), 1 - labels.mean())
    # untrained should not dramatically beat the majority baseline
    assert acc <= chance + 0.2


def test_shortest_path_distance_distribution():
    """Distance labels occupy many classes; path graphs contribute the long
    tail (reference data_distribution_test idea)."""
    seen = set()
    for algo in ("er", "path", "sbm"):
        for s in range(10):
            g = G.generate_graph(algo, s)
            d = G.all_pairs_distances(g)
            iu, iv = np.triu_indices(g.num_nodes, k=1)
            vals = d[iu, iv]
            vals = vals[vals > 0]
            seen.update(np.unique(vals).tolist())
    assert len(seen) >= 8       # er/sbm short distances + path long tail
    assert min(seen) == 1
    # raw graph distances (pre-labeling) have a long tail; the v4 corpus
    # INFs pairs beyond MAX_PATH_CLASSES at record-emission time
    assert max(seen) > G.MAX_PATH_CLASSES


def test_graph_size_buckets():
    """Node counts respect the documented small/medium/large buckets."""
    sizes = [G.generate_graph("er", s).num_nodes for s in range(60)]
    assert min(sizes) >= 10 and max(sizes) < 50
    # all three buckets get hit
    assert any(s < 20 for s in sizes)
    assert any(20 <= s < 40 for s in sizes)
    assert any(s >= 40 for s in sizes)


def test_zinc_distribution():
    """ZINC stand-in matches documented statistics (sizes, atom/bond ranges,
    target spread) — reference zinc_distribution_test idea."""
    from glearning_benchmark_tpu.data.zinc import load_zinc_split
    mols = load_zinc_split(split="val", limit=300)
    sizes = np.array([m.num_nodes for m in mols])
    assert 9 <= sizes.min() and sizes.max() <= 38
    atoms = np.concatenate([m.node_labels for m in mols])
    assert atoms.min() >= 0 and atoms.max() <= 8
    # carbon dominates
    assert (atoms == 0).mean() > 0.5
    bonds = np.concatenate([m.edge_labels for m in mols])
    assert bonds.min() >= 1 and bonds.max() <= 4
    ys = np.array([m.y for m in mols])
    assert ys.std() > 0.3  # non-degenerate regression target
