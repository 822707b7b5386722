"""Byte-exact conformance against the ACTUAL reference implementation.

These tests import the reference's pure-Python modules read-only from
/root/reference (graph_data_loader.data_loader needs only torch;
zinc_vocab is dependency-free; zinc_dataset_indexbase.tokenize_molecule is
exercised through a minimal torch_geometric stub) and assert our rebuilt
pipelines produce identical bytes/ids. Skipped when the reference tree is
not present.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    # stub torch_geometric so zinc_dataset_indexbase imports without PyG
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_data = types.ModuleType("torch_geometric.datasets")
        tg_data.ZINC = object
        tg.datasets = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.datasets"] = tg_data
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import graph_data_loader.data_loader as ref_dl
    import graph_data_loader.zinc_vocab as ref_zv
    import graph_data_loader.zinc_dataset_indexbase as ref_zi
    return ref_dl, ref_zv, ref_zi


def _texts():
    from glearning_benchmark_tpu.data import generator as G
    out = []
    for algo in ("er", "ba", "sbm", "path"):
        for seed in range(6):
            g = G.generate_graph(algo, seed)
            out.append(G.cycle_check_records(g)[0]["text"])
    for seed in range(3):
        g = G.generate_graph("er", 100 + seed)
        out.extend(r["text"] for r in G.shortest_path_records(g, max_pairs=5, seed=seed))
    return out


def test_special_tokens_match(ref_modules):
    ref_dl, _, _ = ref_modules
    from glearning_benchmark_tpu.tokenization import SPECIAL
    assert SPECIAL == ref_dl.SPECIAL


def test_parsers_match(ref_modules):
    ref_dl, _, _ = ref_modules
    from glearning_benchmark_tpu.data.text_grammar import (
        parse_distance_label_from_text,
        parse_query_nodes_from_text,
        parse_yes_no_from_text,
    )
    for t in _texts():
        assert parse_yes_no_from_text(t) == ref_dl.parse_yes_no_from_text(t)
        assert parse_distance_label_from_text(t) == ref_dl.parse_distance_label_from_text(t)
        assert parse_query_nodes_from_text(t) == ref_dl.parse_query_nodes_from_text(t)


def test_vocab_build_matches(ref_modules):
    ref_dl, _, _ = ref_modules
    from glearning_benchmark_tpu.tokenization import build_vocab_from_texts
    texts = _texts()
    ours, _ = build_vocab_from_texts(texts)
    ref, _ = ref_dl.build_vocab_from_texts(texts)
    assert ours == ref
    ours_c, _ = build_vocab_from_texts(texts, min_freq=2, max_tokens=30)
    ref_c, _ = ref_dl.build_vocab_from_texts(texts, min_freq=2, max_tokens=30)
    assert ours_c == ref_c


def test_token_dataset_encoding_matches(ref_modules):
    ref_dl, _, _ = ref_modules
    from glearning_benchmark_tpu.tokenization import build_vocab_from_texts, encode_text
    texts = _texts()
    vocab, _ = ref_dl.build_vocab_from_texts(texts)
    examples = [{"text": t, "label": 1} for t in texts]
    ds = ref_dl.TokenDataset(examples, vocab, max_len=600, require_label=False)
    assert len(ds) == len(texts)
    for i, t in enumerate(texts):
        ref_ids = ds[i][0].numpy()
        our_ids = encode_text(t, vocab, max_len=600)
        np.testing.assert_array_equal(our_ids, ref_ids)


def test_collate_matches(ref_modules):
    ref_dl, _, _ = ref_modules
    import torch
    from glearning_benchmark_tpu.tokenization import build_vocab_from_texts, encode_text
    from glearning_benchmark_tpu.tokenization.pack import pad_sequences
    texts = _texts()[:8]
    vocab, _ = build_vocab_from_texts(texts)
    seqs = [encode_text(t, vocab, max_len=600) for t in texts]
    batch = [(torch.tensor(s.tolist()), torch.tensor(0)) for s in seqs]
    x_ref, attn_ref, _ = ref_dl.collate(batch, vocab["<pad>"])
    x_ours, mask_ours = pad_sequences(seqs, pad_id=vocab["<pad>"])
    np.testing.assert_array_equal(x_ours, x_ref.numpy())
    np.testing.assert_array_equal(mask_ours, attn_ref.numpy())


def test_fixed_zinc_vocab_matches(ref_modules):
    _, ref_zv, _ = ref_modules
    from glearning_benchmark_tpu.tokenization import build_fixed_zinc_vocab
    ours, ours_itos = build_fixed_zinc_vocab()
    ref, ref_itos = ref_zv.build_fixed_zinc_vocab()
    assert ours == ref
    assert ours_itos == ref_itos
    from glearning_benchmark_tpu.tokenization import get_atom_type_id, get_bond_type_id
    for i in range(9):
        assert get_atom_type_id(i) == ref_zv.get_atom_type_id(i)
    for b in range(1, 5):
        assert get_bond_type_id(b) == ref_zv.get_bond_type_id(b)


def test_extend_vocab_matches(ref_modules):
    _, ref_zv, _ = ref_modules
    from glearning_benchmark_tpu.tokenization import (
        build_fixed_zinc_vocab,
        extend_vocab_with_dynamic_tokens,
    )
    base, _ = build_fixed_zinc_vocab()
    dyn = ["0", "1", "val_1_50", "2", "val_neg0_30"]
    assert extend_vocab_with_dynamic_tokens(base, dyn) == \
        ref_zv.extend_vocab_with_dynamic_tokens(base, dyn)


class _ShimTensorless:
    pass


def test_zinc_tokenize_molecule_matches(ref_modules):
    """Drive the reference's actual tokenize_molecule on our molecules via a
    torch Data shim and compare strings byte-for-byte."""
    _, _, ref_zi = ref_modules
    import torch
    from glearning_benchmark_tpu.data.zinc import load_zinc_split
    from glearning_benchmark_tpu.tokenization import tokenize_zinc_molecule

    ds = ref_zi.ZINCTokenizationDataset.__new__(ref_zi.ZINCTokenizationDataset)
    ds.max_len = 1024

    for m in load_zinc_split(split="val", limit=100):
        shim = _ShimTensorless()
        shim.x = torch.tensor(m.node_labels.reshape(-1, 1).tolist())
        shim.edge_index = torch.tensor(np.asarray(m.edges).T.tolist())
        shim.edge_attr = torch.tensor(m.edge_labels.tolist())
        ref_text = ds.tokenize_molecule(shim, float(m.y))
        our_text = tokenize_zinc_molecule(m)
        assert our_text == ref_text


def test_zinc_truncation_matches(ref_modules):
    """__getitem__'s truncation (keep <eos>) vs ours at small max_len."""
    _, _, ref_zi = ref_modules
    import torch
    from glearning_benchmark_tpu.data.zinc import load_zinc_split
    from glearning_benchmark_tpu.tokenization import tokenize_zinc_molecule

    ds = ref_zi.ZINCTokenizationDataset.__new__(ref_zi.ZINCTokenizationDataset)
    for max_len in (30, 50, 80):
        ds.max_len = max_len
        for m in load_zinc_split(split="val", limit=20):
            shim = _ShimTensorless()
            shim.x = torch.tensor(m.node_labels.reshape(-1, 1).tolist())
            shim.edge_index = torch.tensor(np.asarray(m.edges).T.tolist())
            shim.edge_attr = torch.tensor(m.edge_labels.tolist())
            text = ds.tokenize_molecule(shim, float(m.y))
            toks = text.split()
            if len(toks) > max_len:
                toks = toks[: max_len - 1] + ["<eos>"]
                text = " ".join(toks)
            assert tokenize_zinc_molecule(m, max_len=max_len) == text


def test_balance_classes_matches(ref_modules):
    ref_dl, _, _ = ref_modules
    from glearning_benchmark_tpu.data.loader import balance_classes
    ex = ([{"text": f"a{i}", "label": 0} for i in range(10)]
          + [{"text": f"b{i}", "label": 1} for i in range(4)])
    for strat in ("undersample", "median", "oversample", "soft_oversample"):
        ours = balance_classes(list(ex), strategy=strat, seed=3)
        ref = ref_dl.balance_classes(list(ex), strategy=strat, seed=3)
        assert sorted(e["text"] for e in ours) == sorted(e["text"] for e in ref), strat


# ---------------------------------------------------------------------------
# Adapter-level parse conformance (VERDICT r2 #5): the reference's
# graph_token_dataset_nativegraph.py parse path, imported read-only under a
# torch_geometric stub and driven directly — both the standalone parsers
# (reference nativegraph.py:54-117) and the full GraphTokenDataset.process()
# record loop (nativegraph.py:223-424).
# ---------------------------------------------------------------------------


class _StubData:
    """torch_geometric.data.Data stand-in: bag of attributes (picklable)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


@pytest.fixture(scope="module")
def ref_nativegraph(ref_modules):
    tg = sys.modules["torch_geometric"]
    if "torch_geometric.data" not in sys.modules:
        tg_data = types.ModuleType("torch_geometric.data")
        tg_data.Data = _StubData
        tg_data.InMemoryDataset = object
        tg.data = tg_data
        sys.modules["torch_geometric.data"] = tg_data
    import graph_data_loader.graph_token_dataset_nativegraph as ref_ng
    return ref_ng


def _corrupt_text(text, rng):
    toks = text.split()
    for _ in range(rng.randint(1, 6)):
        if not toks:
            break
        i = rng.randrange(len(toks))
        op = rng.randint(0, 3)
        if op == 0:
            del toks[i]
        elif op == 1:
            toks.insert(i, rng.choice(["<e>", "<q>", "<p>", "junk", "-3",
                                       "999999", "INF", ""]))
        elif op == 2:
            toks[i] = rng.choice(["xx", "<n>", "INF", "len99", "<bos>", "yes"])
        else:
            toks[i], toks[-1] = toks[-1], toks[i]
    return " ".join(toks)


def _variant_texts():
    import random
    rng = random.Random(7)
    texts = _texts()
    out = list(texts)
    for t in texts:
        for _ in range(12):
            out.append(_corrupt_text(t, rng))
    return out


def test_parse_graph_from_text_matches_adapter(ref_nativegraph):
    from glearning_benchmark_tpu.data.text_grammar import parse_graph_from_text
    for t in _variant_texts():
        ref_nodes, ref_edges = ref_nativegraph.parse_graph_from_text(t)
        our_nodes, our_edges = parse_graph_from_text(t)
        assert our_nodes == ref_nodes, t
        assert [tuple(e) for e in our_edges] == [tuple(e) for e in ref_edges], t


def test_parse_label_from_text_matches_adapter(ref_nativegraph):
    from glearning_benchmark_tpu.data.text_grammar import parse_cycle_label_from_text
    for t in _variant_texts():
        assert parse_cycle_label_from_text(t) == \
            ref_nativegraph.parse_label_from_text(t), t


def _ref_record_to_graph(ref_ng, ref_dl, text, task, label=None):
    """The reference process() per-record decision logic
    (nativegraph.py:344-418), assembled from the reference's own imported
    parse functions — the oracle for text_record_to_graph."""
    nodes, edges = ref_ng.parse_graph_from_text(text)
    if len(nodes) == 0:
        node_set = set()
        for s, t in edges:
            node_set.add(s)
            node_set.add(t)
        nodes = sorted(node_set)
    if len(nodes) == 0:
        return None
    qu = qv = None
    if task == "shortest_path":
        if label is None:
            label = ref_dl.parse_distance_label_from_text(text)
        q = ref_dl.parse_query_nodes_from_text(text)
        if q is None or label is None:
            return None
        qu, qv = q
    else:
        if label is None:
            label = ref_ng.parse_label_from_text(text)
        if label is None:
            return None
    return (max(nodes) + 1, [tuple(e) for e in edges], int(label), qu, qv)


def test_text_record_to_graph_matches_adapter(ref_modules, ref_nativegraph):
    ref_dl, _, _ = ref_modules
    from glearning_benchmark_tpu.data.text_grammar import text_record_to_graph
    for task in ("cycle_check", "shortest_path"):
        for t in _variant_texts():
            for label in (None, 1):
                ref = _ref_record_to_graph(ref_nativegraph, ref_dl, t, task,
                                           label=label)
                ours = text_record_to_graph(t, task=task, label=label)
                if ref is None:
                    assert ours is None, (task, label, t)
                    continue
                assert ours is not None, (task, label, t)
                n, edges, y, qu, qv = ref
                assert ours.num_nodes == n
                assert [tuple(e) for e in ours.edges.tolist()] == edges
                assert ours.y == y
                assert ours.query_u == qu and ours.query_v == qv


def _run_ref_process(ref_ng, root, task, algorithms, split, tmpdir,
                     num_pairs_per_graph=None, seed=0):
    """Drive the ACTUAL reference GraphTokenDataset.process() — instance
    built without InMemoryDataset machinery, collate captured."""
    ds = object.__new__(ref_ng.GraphTokenDataset)
    ds._root = root
    ds.task = task
    ds.algorithms = list(algorithms)
    ds.algorithm = ds.algorithms[0]
    ds.split = split
    ds.use_split_tasks_dirs = True
    ds.seed = seed
    ds.num_graphs = None  # file sampling uses process-randomized hash(algo)
    ds.num_pairs_per_graph = num_pairs_per_graph
    ds.pre_filter = None
    ds.pre_transform = None
    captured = []
    ds.collate = lambda dl: (captured.extend(dl), None)[1:] + (None,)
    ds.processed_paths = [os.path.join(tmpdir, "data.pt")]
    ds.process()
    return captured


@pytest.fixture(scope="module")
def adapter_corpus(tmp_path_factory):
    from glearning_benchmark_tpu.data import generator as G
    root = str(tmp_path_factory.mktemp("adapter_corpus"))
    G.generate_corpus(root, tasks=("cycle_check", "shortest_path"),
                      algorithms=("ba", "path"), number_of_graphs=12,
                      test_graphs=6, seed=4242)
    return root


@pytest.mark.parametrize("task,split", [("cycle_check", "train"),
                                        ("cycle_check", "val"),
                                        ("shortest_path", "train"),
                                        ("shortest_path", "test")])
def test_process_matches_load_graphs(ref_nativegraph, adapter_corpus,
                                     tmp_path, task, split):
    """End-to-end: the reference's own GraphTokenDataset.process() on our
    generated corpus produces the same graphs (count, node counts, edge
    lists, labels, queries) as load_graphs_multi_algorithm."""
    from glearning_benchmark_tpu.data.loader import load_graphs_multi_algorithm
    ref = _run_ref_process(ref_nativegraph, adapter_corpus, task,
                           ["ba", "path"], split, str(tmp_path))
    ours = load_graphs_multi_algorithm(adapter_corpus, task, ["ba", "path"],
                                       split, use_split_tasks_dirs=True,
                                       seed=0)
    assert len(ours) == len(ref) > 0
    for og, rg in zip(ours, ref):
        assert og.num_nodes == int(rg.num_nodes)
        ref_edges = [tuple(e) for e in rg.edge_index.t().tolist()]
        assert [tuple(e) for e in og.edges.tolist()] == ref_edges
        assert og.y == int(rg.y[0])
        assert tuple(rg.x.shape) == (og.num_nodes, 1)
        if task == "shortest_path":
            assert og.query_u == int(rg.query_u[0])
            assert og.query_v == int(rg.query_v[0])


def test_process_pair_sampling_is_valid_subset(ref_nativegraph,
                                               adapter_corpus, tmp_path):
    """num_pairs_per_graph: the reference's two adapters sample DIFFERENT
    populations (data_loader.py:157-206 samples all emitted pairs incl. INF;
    nativegraph.py:281-313 first drops INF/parse-failures, then samples), so
    per-item identity across paths is impossible even reference-internally.
    Contract held instead: our sampled set is a per-graph-capped subset of
    the reference's unsampled valid set, with identical per-record parses."""
    from glearning_benchmark_tpu.data.loader import load_graphs_multi_algorithm
    k = 3
    full = _run_ref_process(ref_nativegraph, adapter_corpus, "shortest_path",
                            ["ba", "path"], "train", str(tmp_path))
    ref_keys = {}
    for rg in full:
        key = (int(rg.num_nodes),
               tuple(tuple(e) for e in rg.edge_index.t().tolist()),
               int(rg.query_u[0]), int(rg.query_v[0]))
        ref_keys[key] = int(rg.y[0])
    ours = load_graphs_multi_algorithm(adapter_corpus, "shortest_path",
                                       ["ba", "path"], "train",
                                       use_split_tasks_dirs=True, seed=0,
                                       num_pairs_per_graph=k)
    # sampling genuinely reduced the pair count (all-pairs emission gives
    # far more than k per graph at these sizes)
    assert 0 < len(ours) < len(full)
    for og in ours:
        key = (og.num_nodes, tuple(tuple(e) for e in og.edges.tolist()),
               og.query_u, og.query_v)
        assert key in ref_keys, "sampled a pair the reference path rejects"
        assert og.y == ref_keys[key]


def test_query_encoding_matches_adapter(ref_nativegraph):
    torch = pytest.importorskip("torch")
    from glearning_benchmark_tpu.data.graphs import Graph, batch_graphs
    g = Graph(edges=np.asarray([[0, 1], [1, 2], [2, 3]], np.int32),
              num_nodes=5, y=2, query_u=1, query_v=3)
    batch = batch_graphs([g], query_encoding=True)
    ref_x = ref_nativegraph.add_query_encoding_to_features(
        torch.ones((5, 1)), 1, 3).numpy()
    np.testing.assert_array_equal(batch.node_feat[0, :5], ref_x)
    # the transform wrapper (AddQueryEncoding) behaves identically
    data = _StubData(x=torch.ones((5, 1)),
                     query_u=torch.tensor([1]), query_v=torch.tensor([3]))
    data = ref_nativegraph.AddQueryEncoding()(data)
    np.testing.assert_array_equal(batch.node_feat[0, :5], data.x.numpy())
