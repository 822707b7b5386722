"""Graphlet orbit counting + MMD corpus statistics (eval/graph_stats.py,
native/gstats.cpp) — the ORCA-equivalent evaluation layer (reference
docs/setup.md:30-36 compiles AutoGraph's ORCA for this capability)."""

import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.eval.graph_stats import (
    _orbit_counts_numpy,
    clustering_coefficients,
    compare_corpora,
    degree_histogram,
    mmd_gaussian_tv,
    mmd_rbf,
    orbit_counts,
    orbit_counts_batch,
)


def _counts(edges, n):
    return _orbit_counts_numpy(np.asarray(edges), n)


def test_orbit_tables_by_hand():
    # single edge: both endpoints orbit 0 once
    c = _counts([[0, 1]], 2)
    assert c[:, 0].tolist() == [1, 1] and c[:, 1:].sum() == 0
    # P3 path 0-1-2: ends orbit 1, middle orbit 2
    c = _counts([[0, 1], [1, 2]], 3)
    assert c[:, 1].tolist() == [1, 0, 1]
    assert c[:, 2].tolist() == [0, 1, 0]
    # triangle: every node orbit 3 once
    c = _counts([[0, 1], [1, 2], [0, 2]], 3)
    assert c[:, 3].tolist() == [1, 1, 1]
    # P4 path 0-1-2-3: ends orbit 4, middles orbit 5
    c = _counts([[0, 1], [1, 2], [2, 3]], 4)
    assert c[:, 4].tolist() == [1, 0, 0, 1]
    assert c[:, 5].tolist() == [0, 1, 1, 0]
    # 3-star centred at 0: leaves orbit 6, centre orbit 7
    c = _counts([[0, 1], [0, 2], [0, 3]], 4)
    assert c[:, 6].tolist() == [0, 1, 1, 1]
    assert c[:, 7].tolist() == [1, 0, 0, 0]
    # C4: all orbit 8
    c = _counts([[0, 1], [1, 2], [2, 3], [3, 0]], 4)
    assert c[:, 8].tolist() == [1, 1, 1, 1]
    # paw: triangle 0-1-2 + tail 2-3
    c = _counts([[0, 1], [1, 2], [0, 2], [2, 3]], 4)
    assert c[:, 9].tolist() == [0, 0, 0, 1]     # tail
    assert c[:, 10].tolist() == [1, 1, 0, 0]    # off-tail triangle nodes
    assert c[:, 11].tolist() == [0, 0, 1, 0]    # on-tail triangle node
    # diamond: K4 minus edge 0-3
    c = _counts([[0, 1], [0, 2], [1, 2], [1, 3], [2, 3]], 4)
    assert c[:, 12].tolist() == [1, 0, 0, 1]
    assert c[:, 13].tolist() == [0, 1, 1, 0]
    # K4: all orbit 14
    c = _counts([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], 4)
    assert c[:, 14].tolist() == [1, 1, 1, 1]


def test_orbit_identities_vs_networkx():
    """Aggregate orbit counts must satisfy independent identities computed
    with networkx on random graphs."""
    import networkx as nx

    rng = np.random.default_rng(0)
    for trial in range(6):
        n = int(rng.integers(5, 12))
        p = float(rng.uniform(0.25, 0.6))
        gx = nx.gnp_random_graph(n, p, seed=int(rng.integers(1 << 30)))
        edges = np.array(gx.edges, dtype=np.int64).reshape(-1, 2)
        c = _counts(edges, n)
        # orbit 0 sums to 2E
        assert c[:, 0].sum() == 2 * gx.number_of_edges()
        # orbit 3 per node == triangles through the node
        tri = nx.triangles(gx)
        assert all(c[v, 3] == tri[v] for v in gx.nodes)
        # K4 count via clique enumeration: orbit 14 sums to 4 * #K4
        k4 = sum(1 for q in nx.enumerate_all_cliques(gx) if len(q) == 4)
        assert c[:, 14].sum() == 4 * k4
        # every 4-node connected induced subgraph contributes exactly 4
        # orbit increments; count them independently
        n_conn4 = 0
        from itertools import combinations
        for quad in combinations(range(n), 4):
            sub = gx.subgraph(quad)
            if sub.number_of_edges() >= 3 and nx.is_connected(sub):
                n_conn4 += 1
        assert c[:, 4:].sum() == 4 * n_conn4


def test_native_matches_numpy():
    from glearning_benchmark_tpu.native import gstats_available

    if not gstats_available():
        pytest.skip("native gstats unavailable")
    rng = np.random.default_rng(1)
    edges_list, nn = [], []
    for _ in range(12):
        g = G.generate_graph(
            ["er", "ba", "sbm", "star", "path"][int(rng.integers(5))],
            int(rng.integers(1 << 20)))
        edges_list.append(np.asarray(g.edges).reshape(-1, 2))
        nn.append(g.num_nodes)
    edges_list.append(np.zeros((0, 2), dtype=np.int64))  # edgeless graph
    nn.append(3)
    got = orbit_counts_batch(edges_list, nn)  # native path
    for e, n, a in zip(edges_list, nn, got):
        b = _orbit_counts_numpy(e, n)
        assert np.array_equal(a, b), "native/numpy orbit mismatch"


def test_orbit_counts_single_api():
    g = G.generate_graph("er", 7)
    c = orbit_counts(np.asarray(g.edges), g.num_nodes)
    assert c.shape == (g.num_nodes, 15)


def test_clustering_and_degree_stats():
    import networkx as nx

    gx = nx.gnp_random_graph(10, 0.4, seed=3)
    edges = np.array(gx.edges, dtype=np.int64).reshape(-1, 2)
    c = clustering_coefficients(edges, 10)
    want = nx.clustering(gx)
    assert np.allclose(c, [want[v] for v in range(10)])
    h = degree_histogram(edges, 10)
    assert h.sum() == pytest.approx(1.0)
    assert h[int(np.mean([d for _, d in gx.degree]))] >= 0


def test_mmd_sanity():
    rng = np.random.default_rng(2)
    a = [rng.dirichlet(np.ones(8)) for _ in range(20)]
    # identical sample sets -> 0
    assert mmd_gaussian_tv(a, list(a)) == pytest.approx(0.0, abs=1e-12)
    # shifted set -> strictly positive
    b = [np.roll(x, 3) for x in a]
    assert mmd_gaussian_tv(a, b) > 1e-4
    xs = rng.normal(size=(15, 15))
    assert mmd_rbf(xs, xs) == pytest.approx(0.0, abs=1e-12)
    assert mmd_rbf(xs, xs + 25.0) > 1e-3


def test_compare_corpora_discriminates_generators():
    """Same-generator corpora must be far closer than cross-generator ones
    on every statistic — the AutoGraph generation-quality use case."""
    def gen(algo, seed0, k=30):
        return [G.generate_graph(algo, seed0 + i) for i in range(k)]

    er_a, er_b = gen("er", 0), gen("er", 1000)
    star = gen("star", 2000)
    same = compare_corpora(er_a, er_b)
    diff = compare_corpora(er_a, star)
    for key in ("degree_mmd", "clustering_mmd", "orbit_mmd"):
        assert diff[key] > same[key], (key, same[key], diff[key])
