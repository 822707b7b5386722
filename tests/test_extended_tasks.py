"""Extended task families beyond the reference's exercised pair:
reachability, edge_existence, node_degree, node_count, triangle_count
(grammar per reference docs/synthetic_data.md:22-42)."""

import tempfile

import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.loader import load_examples_multi_algorithm
from glearning_benchmark_tpu.data.text_grammar import text_record_to_graph
from glearning_benchmark_tpu.train.trainer import train


def test_task_oracles():
    g = G.generate_graph("er", 5)
    # reachability agrees with BFS
    recs = G.reachability_records(g, max_pairs=10, seed=0)
    d = G.all_pairs_distances(g)
    for r in recs:
        gg = text_record_to_graph(r["text"], task="reachability")
        assert gg.y == int(d[gg.query_u, gg.query_v] > 0)
    # edge existence agrees with the edge set
    has_edge = {tuple(sorted(map(int, e))) for e in g.edges}
    for r in G.edge_existence_records(g, max_pairs=10, seed=0):
        gg = text_record_to_graph(r["text"], task="edge_existence")
        assert gg.y == int(tuple(sorted((gg.query_u, gg.query_v))) in has_edge)
    # node degree agrees with degree counts
    deg = g.degrees()
    for r in G.node_degree_records(g, max_pairs=8, seed=0):
        gg = text_record_to_graph(r["text"], task="node_degree")
        assert gg.y == int(deg[gg.query_u])
    # global counts
    nc = text_record_to_graph(G.node_count_records(g)[0]["text"], task="node_count")
    assert nc.y == g.num_nodes
    tc = text_record_to_graph(G.triangle_count_records(g)[0]["text"],
                              task="triangle_count")
    a = g.adjacency()
    assert tc.y == int(round(np.trace(a @ a @ a) / 6))


@pytest.mark.parametrize("task", ["reachability", "edge_existence",
                                  "node_degree", "node_count"])
def test_corpus_and_loading(task, tmp_path):
    root = str(tmp_path)
    G.generate_corpus(root, tasks=(task,), algorithms=("er",),
                      number_of_graphs=6, test_graphs=3, seed=5)
    ex = load_examples_multi_algorithm(root, task, ["er"], "train")
    assert len(ex) > 0
    assert all(e["label"] is not None for e in ex)
    if task in ("reachability", "edge_existence", "node_degree"):
        assert all("query_u" in e for e in ex)


@pytest.mark.parametrize("model_name,task", [
    ("ibtt", "reachability"),
    ("ibtt", "node_degree"),
    ("mpnn", "edge_existence"),
    ("agtt", "reachability"),
    # regression: maximum_flow / node_classification were missing from the
    # QUERY_TASKS table, so AGTT trails and graph-model feature columns
    # carried NO query — an unsolvable dataset (many labels per graph)
    ("agtt", "maximum_flow"),
    ("mpnn", "node_classification"),
])
def test_train_extended_task(model_name, task, tmp_path):
    root = tempfile.mkdtemp()
    # node_classification needs community-labeled (SBM) graphs
    algos = (["sbm"], "sbm") if task == "node_classification" else (["er"], "ba")
    cfg = {
        "dataset": {"graph_token_root": root, "task": task,
                    "train_algorithms": algos[0], "test_algorithm": algos[1],
                    "use_split_tasks_dirs": True, "num_graphs": 15,
                    "max_len": 600, "max_vocab": 600, "generate_num_graphs": 15},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
                  "dropout": 0.1, "max_pos": 600,
                  "hidden_dim": 16, "num_layers": 2, "pooling": "mean"},
        "train": {"batch_size": 16, "epochs": 3, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": str(tmp_path), "run_name": f"{model_name}-{task}"},
        "wandb": {"use": False},
    }
    res = train(cfg, model_name, verbose=False)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"] * 1.5
    assert np.isfinite(res.best_val)


def test_new_task_oracles():
    """Round-2 families: edge_count, maximum_flow (vs networkx), node
    classification (SBM communities), connected/disconnected node lists."""
    import networkx as nx

    g = G.generate_graph("er", 11)
    # edge_count
    ec = text_record_to_graph(G.edge_count_records(g)[0]["text"],
                              task="edge_count")
    assert ec.y == len(g.edges)
    # maximum_flow against networkx on the same graph
    dg = nx.DiGraph()
    dg.add_nodes_from(range(g.num_nodes))
    for u, v in g.edges.tolist():
        dg.add_edge(u, v, capacity=1)
        dg.add_edge(v, u, capacity=1)
    for r in G.maximum_flow_records(g, max_pairs=12, seed=0):
        gg = text_record_to_graph(r["text"], task="maximum_flow")
        assert gg.y == nx.maximum_flow_value(dg, gg.query_u, gg.query_v)
    # node_classification only on SBM (community-labeled) graphs
    assert G.node_classification_records(g) == []  # er: no labels
    gs = G.generate_graph("sbm", 7)
    assert gs.node_labels is not None
    recs = G.node_classification_records(gs, max_pairs=None)
    assert len(recs) == gs.num_nodes
    for r in recs:
        gg = text_record_to_graph(r["text"], task="node_classification")
        assert gg.y == int(gs.node_labels[gg.query_u])
    # connected_nodes text carries the exact sorted neighbor set
    adj = {i: set() for i in range(g.num_nodes)}
    for u, v in g.edges.tolist():
        adj[u].add(v)
        adj[v].add(u)
    for r in G.connected_nodes_records(g, max_pairs=6, seed=0):
        toks = r["text"].split()
        u = int(toks[toks.index("<q>") + 1 + 1])  # '<q> neighbors u'
        lab = toks[toks.index("<p>") + 1:toks.index("<eos>")]
        want = sorted(adj[u])
        assert lab == (list(map(str, want)) if want else ["none"])
    # disconnected_nodes lists exactly the degree-0 nodes
    deg = g.degrees()
    r = G.disconnected_nodes_records(g)[0]
    toks = r["text"].split()
    lab = toks[toks.index("<p>") + 1:toks.index("<eos>")]
    iso = [str(i) for i in range(g.num_nodes) if deg[i] == 0]
    assert lab == (iso if iso else ["none"])


@pytest.mark.parametrize("task,algo", [("edge_count", "er"),
                                       ("maximum_flow", "er"),
                                       ("node_classification", "sbm")])
def test_new_corpus_and_loading(task, algo, tmp_path):
    root = str(tmp_path)
    G.generate_corpus(root, tasks=(task,), algorithms=(algo,),
                      number_of_graphs=6, test_graphs=3, seed=5)
    ex = load_examples_multi_algorithm(root, task, [algo], "train")
    assert len(ex) > 0
    assert all(e["label"] is not None for e in ex)


def test_train_maximum_flow(tmp_path):
    root = tempfile.mkdtemp()
    cfg = {
        "dataset": {"graph_token_root": root, "task": "maximum_flow",
                    "train_algorithms": ["er"], "test_algorithm": "ba",
                    "use_split_tasks_dirs": True, "num_graphs": 15,
                    "max_len": 600, "max_vocab": 600, "generate_num_graphs": 15},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
                  "dropout": 0.1, "max_pos": 600},
        "train": {"batch_size": 16, "epochs": 3, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": str(tmp_path), "run_name": "ibtt-maxflow"},
        "wandb": {"use": False},
    }
    res = train(cfg, "ibtt", verbose=False)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"] * 1.5
    assert np.isfinite(res.best_val)
