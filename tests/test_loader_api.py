"""API-parity helpers: connected-nodes loader, glob resolvers, graph-list
class counting and balanced indices."""

import json
import os

import numpy as np

from glearning_benchmark_tpu.data import (
    determine_num_classes_graphs,
    get_balanced_indices,
    get_zinc_num_types,
    load_examples_connected_nodes,
    resolve_multi_algorithm_globs,
    resolve_split_globs,
)
from glearning_benchmark_tpu.data.generator import generate_corpus
from glearning_benchmark_tpu.data.graphs import Graph


def test_get_zinc_num_types():
    assert get_zinc_num_types() == (9, 4)


def test_connected_nodes_loader(tmp_path):
    rec = {"text": "<bos> 0 1 <e> <n> 0 1", "u": 0, "v": 1, "label": "yes"}
    with open(tmp_path / "a.json", "w") as f:
        json.dump([rec], f)
    ex = load_examples_connected_nodes(str(tmp_path / "*.json"))
    assert len(ex) == 1
    assert ex[0]["label"] == 1
    assert ex[0]["text"].endswith("<q> 0 1 <p>")


def test_resolve_globs(tmp_path):
    root = str(tmp_path)
    generate_corpus(root, tasks=("cycle_check",), algorithms=("ba",),
                    number_of_graphs=3, test_graphs=2, seed=1)
    tg, vg, eg = resolve_split_globs(root, "cycle_check", "ba")
    assert "tasks_train" in tg and tg.endswith("*.json")
    tgs, vgs, eg2 = resolve_multi_algorithm_globs(root, "cycle_check", ["ba"], "ba")
    assert tgs == [tg] and eg2 == eg


def test_determine_num_classes_graphs():
    gs = [Graph(edges=np.zeros((0, 2), np.int32), num_nodes=2, y=y)
          for y in (0, 3, 1)]
    assert determine_num_classes_graphs(gs, "shortest_path") == 4
    assert determine_num_classes_graphs(gs, "cycle_check") == 2
    assert determine_num_classes_graphs(gs, "zinc") == 1


def test_get_balanced_indices():
    gs = [Graph(edges=np.zeros((0, 2), np.int32), num_nodes=2, y=0)] * 9 + \
         [Graph(edges=np.zeros((0, 2), np.int32), num_nodes=2, y=1)] * 3
    idx = get_balanced_indices(gs, strategy="undersample", seed=0)
    labels = [gs[i].y for i in idx]
    assert labels.count(0) == labels.count(1) == 3
