"""Visualization utilities smoke tests."""

import numpy as np

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.train.viz import (
    create_confusion_matrix_heatmap,
    create_graph_visualizations,
    log_graph_examples,
    visualize_graph,
)


def test_log_graph_examples_text():
    gs = [G.generate_graph("ba", s) for s in range(3)]
    txt = log_graph_examples(gs, task="cycle_check", num_examples=2)
    assert "Example Graphs" in txt and "Nodes:" in txt


def test_visualize_graph_image():
    g = G.generate_graph("er", 1)
    img = visualize_graph(g, task="cycle_check")
    assert img.size[0] > 100 and img.size[1] > 100


def test_confusion_heatmap():
    cm = np.array([[40, 3], [2, 55]])
    img = create_confusion_matrix_heatmap(cm, task="cycle_check")
    assert img.size[0] > 100
    cm7 = np.diag(np.arange(1, 8))
    img7 = create_confusion_matrix_heatmap(cm7, task="shortest_path")
    assert img7.size[0] > 100


def test_create_graph_visualizations_batch():
    gs = [G.generate_graph("path", s) for s in range(2)]
    imgs = create_graph_visualizations(gs, task="cycle_check", num_examples=2)
    assert len(imgs) == 2
