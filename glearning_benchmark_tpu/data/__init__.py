from .graphs import Graph, GraphBatch, batch_graphs, pad_graphs
from .text_grammar import (
    graph_to_text,
    parse_graph_from_text,
    parse_yes_no_from_text,
    parse_distance_label_from_text,
    parse_query_nodes_from_text,
)
from .generator import generate_corpus, generate_graph, ALGORITHMS
from .loader import (
    load_examples,
    load_examples_multi_algorithm,
    load_examples_connected_nodes,
    load_graphs_multi_algorithm,
    determine_num_classes,
    determine_num_classes_graphs,
    balance_classes,
    get_balanced_indices,
    resolve_split_dir,
    resolve_split_globs,
    resolve_multi_algorithm_globs,
)
from .zinc import (
    load_zinc_split, zinc_atom_symbol, zinc_bond_name, get_zinc_num_types,
    ZINC_NUM_ATOM_TYPES, ZINC_NUM_BOND_TYPES,
)

__all__ = [
    "Graph", "GraphBatch", "batch_graphs", "pad_graphs",
    "graph_to_text", "parse_graph_from_text", "parse_yes_no_from_text",
    "parse_distance_label_from_text", "parse_query_nodes_from_text",
    "generate_corpus", "generate_graph", "ALGORITHMS",
    "load_examples", "load_examples_multi_algorithm",
    "load_examples_connected_nodes", "load_graphs_multi_algorithm",
    "determine_num_classes", "determine_num_classes_graphs",
    "balance_classes", "get_balanced_indices", "resolve_split_dir",
    "resolve_split_globs", "resolve_multi_algorithm_globs",
    "load_zinc_split", "zinc_atom_symbol", "zinc_bond_name",
    "get_zinc_num_types", "ZINC_NUM_ATOM_TYPES", "ZINC_NUM_BOND_TYPES",
]
