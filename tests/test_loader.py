"""Corpus generation + loading tests (layout resolution, sampling,
leakage detection — reference test/train_performance_test.py:146-207 idea)."""

import os

import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.loader import (
    balance_classes,
    determine_num_classes,
    load_examples_multi_algorithm,
    load_graphs_multi_algorithm,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    G.generate_corpus(root, tasks=("cycle_check", "shortest_path"),
                      algorithms=("ba", "sbm", "sfn"),
                      number_of_graphs=20, test_graphs=8, seed=99)
    return root


def test_layout(corpus):
    assert os.path.isdir(os.path.join(corpus, "tasks_train", "cycle_check", "ba", "train"))
    assert os.path.isdir(os.path.join(corpus, "tasks_test", "shortest_path", "sbm", "test"))


def test_load_cycle_check(corpus):
    ex = load_examples_multi_algorithm(corpus, "cycle_check", ["ba", "sbm"], "train")
    assert len(ex) == 40  # one record per graph file
    labels = {e["label"] for e in ex}
    assert labels <= {0, 1} and len(labels) == 2
    assert determine_num_classes(ex, "cycle_check") == 2


def test_load_shortest_path_pair_sampling(corpus):
    ex = load_examples_multi_algorithm(
        corpus, "shortest_path", ["ba"], "train", num_pairs_per_graph=5)
    assert 0 < len(ex) <= 20 * 5
    for e in ex[:10]:
        assert "query_u" in e and e["label"] is not None
        assert 0 <= e["label"] < 7
    nc = determine_num_classes(ex, "shortest_path")
    assert 1 <= nc <= 7


def test_num_graphs_sampling(corpus):
    ex_full = load_examples_multi_algorithm(corpus, "cycle_check", ["ba"], "train")
    ex_sub = load_examples_multi_algorithm(corpus, "cycle_check", ["ba"], "train", num_graphs=7)
    assert len(ex_full) == 20 and len(ex_sub) == 7
    # stable across calls (stable_hash seeding, not Python hash())
    ex_sub2 = load_examples_multi_algorithm(corpus, "cycle_check", ["ba"], "train", num_graphs=7)
    assert [e["text"] for e in ex_sub] == [e["text"] for e in ex_sub2]


def test_val_fallback_to_test(corpus):
    ex = load_examples_multi_algorithm(corpus, "cycle_check", ["ba"], "val")
    assert len(ex) == 8


def test_graph_native_loading(corpus):
    gs = load_graphs_multi_algorithm(corpus, "cycle_check", ["ba", "sbm"], "train")
    assert len(gs) == 40
    for g in gs[:5]:
        assert g.num_nodes > 0 and g.y in (0, 1)
    # shortest_path graphs carry queries
    gsp = load_graphs_multi_algorithm(corpus, "shortest_path", ["ba"], "train",
                                      num_pairs_per_graph=3)
    assert all(g.query_u is not None for g in gsp)


def test_no_train_test_leakage(corpus):
    """Train and test graph sets must be disjoint (hash on (n, edge set))."""
    def keys(graphs):
        return {(g.num_nodes, tuple(sorted(map(tuple, np.sort(g.edges, axis=1).tolist()))))
                for g in graphs}
    tr = keys(load_graphs_multi_algorithm(corpus, "cycle_check", ["ba"], "train"))
    te = keys(load_graphs_multi_algorithm(corpus, "cycle_check", ["ba"], "test"))
    assert not (tr & te)


def test_balance_classes():
    ex = [{"text": "a", "label": 0}] * 10 + [{"text": "b", "label": 1}] * 4
    bal = balance_classes(ex, strategy="undersample", seed=0)
    labs = [e["label"] for e in bal]
    assert labs.count(0) == labs.count(1) == 4
    over = balance_classes(ex, strategy="oversample", seed=0)
    labs = [e["label"] for e in over]
    assert labs.count(0) == labs.count(1) == 10
