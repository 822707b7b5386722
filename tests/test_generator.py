"""Generator + grammar tests (the reference's test/graph_seq_test.py and
test/train_performance_test.py ideas as real pytest: representation
consistency, oracle-label verification, determinism, distribution sanity)."""

import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.graphs import Graph
from glearning_benchmark_tpu.data.text_grammar import (
    parse_distance_label_from_text,
    parse_graph_from_text,
    parse_query_nodes_from_text,
    parse_yes_no_from_text,
    text_record_to_graph,
)


@pytest.mark.parametrize("algo", G.ALGORITHMS)
def test_roundtrip_text(algo):
    for seed in range(5):
        g = G.generate_graph(algo, seed)
        text = G.cycle_check_records(g)[0]["text"]
        nodes, edges = parse_graph_from_text(text)
        assert nodes == list(range(g.num_nodes))
        assert len(edges) == g.num_edges
        got = {tuple(sorted(e)) for e in edges}
        want = {tuple(sorted(map(int, e))) for e in g.edges}
        assert got == want


@pytest.mark.parametrize("algo", G.ALGORITHMS)
def test_determinism(algo):
    a = G.generate_graph(algo, 123)
    b = G.generate_graph(algo, 123)
    assert a.num_nodes == b.num_nodes
    assert np.array_equal(a.edges, b.edges)


def test_cycle_oracle_dfs_independent():
    """Union-find oracle agrees with an independent DFS cycle check
    (the reference verifies labels against a DFS oracle,
    test/train_performance_test.py:27-67)."""
    def dfs_has_cycle(g: Graph) -> bool:
        adj = [[] for _ in range(g.num_nodes)]
        for i, (u, v) in enumerate(g.edges):
            adj[int(u)].append((int(v), i))
            adj[int(v)].append((int(u), i))
        seen = [False] * g.num_nodes
        for s in range(g.num_nodes):
            if seen[s]:
                continue
            stack = [(s, -1)]
            seen[s] = True
            while stack:
                node, via = stack.pop()
                for nb, ei in adj[node]:
                    if ei == via:
                        continue
                    if seen[nb]:
                        return True
                    seen[nb] = True
                    stack.append((nb, ei))
        return False

    for algo in G.ALGORITHMS:
        for seed in range(8):
            g = G.generate_graph(algo, seed)
            assert G.has_cycle(g) == dfs_has_cycle(g), (algo, seed)


def test_known_topologies():
    path = Graph(edges=np.array([[0, 1], [1, 2], [2, 3]], dtype=np.int32), num_nodes=4, y=0)
    cyc = Graph(edges=np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int32), num_nodes=3, y=0)
    assert not G.has_cycle(path)
    assert G.has_cycle(cyc)
    d = G.all_pairs_distances(path)
    assert d[0, 3] == 3 and d[1, 3] == 2


def test_shortest_path_records():
    """Default (v4, reference parity): all pairs emitted; distances beyond
    len7 are INF (label None), matching the reference's len1-len7 class
    space (ref metrics.py:83-84)."""
    g = G.generate_graph("path", 0)
    recs = G.shortest_path_records(g)
    assert len(recs) == g.num_nodes * (g.num_nodes - 1) // 2
    for r in recs:
        q = parse_query_nodes_from_text(r["text"])
        lab = parse_distance_label_from_text(r["text"])
        assert q is not None
        u, v = q
        if abs(u - v) > G.MAX_PATH_CLASSES:
            assert lab is None
        else:
            assert lab == abs(u - v) - 1  # 0-indexed


def test_shortest_path_records_uncapped_opt_in():
    """max_classes=None emits true distances for every reachable pair."""
    g = G.generate_graph("path", 0)
    recs = G.shortest_path_records(g, max_classes=None)
    for r in recs[:50]:
        q = parse_query_nodes_from_text(r["text"])
        lab = parse_distance_label_from_text(r["text"])
        u, v = q
        assert lab == abs(u - v) - 1


def test_label_parsers():
    assert parse_yes_no_from_text("<bos> 0 1 <e> <q> has_cycle <p> yes <eos>") == 1
    assert parse_yes_no_from_text("<p> no <eos>") == 0
    assert parse_distance_label_from_text("<p> len3 <eos>") == 2
    assert parse_distance_label_from_text("<p> INF <eos>") is None
    assert parse_query_nodes_from_text("<q> shortest_distance 4 7 <p> len1") == (4, 7)


def test_cycle_label_mix():
    """ba+sbm training mix must contain both labels (test data-sanity idea
    from the reference's train_performance_test)."""
    labels = []
    for algo in ("ba", "sbm", "er"):
        for seed in range(30):
            labels.append(G.has_cycle(G.generate_graph(algo, seed)))
    frac = np.mean(labels)
    assert 0.1 < frac < 0.98, f"degenerate cycle label distribution: {frac}"


def test_text_record_to_graph_query():
    g = G.generate_graph("er", 3)
    recs = G.shortest_path_records(g)
    found = 0
    for r in recs:
        gg = text_record_to_graph(r["text"], task="shortest_path")
        if gg is None:
            continue  # INF pair dropped
        assert gg.query_u is not None
        assert gg.num_nodes == g.num_nodes
        found += 1
    assert found > 0


def test_difficulty_hard_per_algo_plan(tmp_path):
    """`difficulty: hard` generates each algorithm with its own knobs
    (DIFFICULTY_PLANS): near-threshold er, thinned sbm, medium+large sizes
    everywhere — stamped per directory so presets never mix."""
    root = str(tmp_path / "hard")
    G.ensure_corpus(root, tasks=("cycle_check",),
                    algorithms=["er", "sbm", "ba"], number_of_graphs=8,
                    difficulty="hard")

    def stamp(algo):
        with open(f"{root}/tasks_train/cycle_check/{algo}/train/.complete") as f:
            return f.read()

    assert "sparsity=0.02-0.05" in stamp("er")
    assert "sparsity=0.04-0.1" in stamp("sbm")
    assert "sparsity=0.1-0.2" in stamp("ba")  # plan default keeps density
    for algo in ("er", "sbm", "ba"):
        assert "buckets=medium+large" in stamp(algo)
    # the size plan is honored in the emitted graphs (no small bucket)
    import json as _json
    from glob import glob
    for p in glob(f"{root}/tasks_train/cycle_check/er/train/*.json")[:4]:
        with open(p) as f:
            recs = _json.load(f)
        gg = text_record_to_graph(recs[0]["text"], task="cycle_check")
        assert gg.num_nodes >= 20


def test_difficulty_dataset_cfg_wiring(tmp_path):
    """dataset.difficulty flows through _resolve_corpus_root: dedicated
    -hard root, per-algo plan applied."""
    from glearning_benchmark_tpu.train.datasets import _resolve_corpus_root
    cfg = {"graph_token_root": str(tmp_path / "gt"), "task": "cycle_check",
           "train_algorithms": ["er"], "test_algorithm": "ba",
           "generate_num_graphs": 8, "difficulty": "hard"}
    root = _resolve_corpus_root(cfg, seed=0)
    assert root.endswith("-hard")
    with open(f"{root}/tasks_train/cycle_check/er/train/.complete") as f:
        assert "sparsity=0.02-0.05" in f.read()
