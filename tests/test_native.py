"""Native (C++) tokenization core: bit-exact against the Python reference
implementations. Skipped when no compiler toolchain is available."""

import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.zinc import load_zinc_split
from glearning_benchmark_tpu.tokenization.ibtt import encode_texts
from glearning_benchmark_tpu.tokenization.sent import TrailTokenizer
from glearning_benchmark_tpu.tokenization.vocab import build_vocab_from_texts

native = pytest.importorskip("glearning_benchmark_tpu.native")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library could not be built")


def test_sent_native_matches_python_unlabeled():
    graphs = [G.generate_graph(a, s)
              for a in ("er", "ba", "sbm", "path", "star", "complete")
              for s in range(10)]
    tok = TrailTokenizer(max_length=600, truncation_length=600)
    tok.set_num_nodes(max(g.num_nodes for g in graphs))
    ids, lens = native.sent_tokenize_batch_native(graphs, tok.idx_offset, 600)
    for i, g in enumerate(graphs):
        np.testing.assert_array_equal(tok(g), ids[i, : lens[i]])
        assert (ids[i, lens[i]:] == TrailTokenizer.pad).all()


def test_sent_native_matches_python_labeled():
    mols = load_zinc_split(split="val", limit=60)
    tok = TrailTokenizer(max_length=1024, truncation_length=1024, labeled_graph=True)
    tok.set_num_nodes(max(m.num_nodes for m in mols))
    tok.set_num_node_and_edge_types(9, 4)
    ids, lens = native.sent_tokenize_batch_native(
        mols, tok.idx_offset, 1024, labeled=True,
        node_idx_offset=tok.node_idx_offset, edge_idx_offset=tok.edge_idx_offset)
    for i, m in enumerate(mols):
        np.testing.assert_array_equal(tok(m), ids[i, : lens[i]])


def test_sent_native_truncation():
    graphs = [G.generate_graph("complete", 5)]
    tok = TrailTokenizer(max_length=16, truncation_length=16)
    tok.set_num_nodes(graphs[0].num_nodes)
    ids, lens = native.sent_tokenize_batch_native(graphs, tok.idx_offset, 16)
    np.testing.assert_array_equal(tok(graphs[0]), ids[0, : lens[0]])
    assert lens[0] <= 16


def test_encode_native_matches_python():
    graphs = [G.generate_graph(a, s) for a in ("er", "ba") for s in range(10)]
    texts = [G.cycle_check_records(g)[0]["text"] for g in graphs]
    vocab, _ = build_vocab_from_texts(texts)
    ids_p, lens_p = encode_texts(texts, vocab, max_len=600)
    ids_n, lens_n = native.encode_texts_native(texts, vocab, max_len=600)
    np.testing.assert_array_equal(lens_p, lens_n)
    np.testing.assert_array_equal(ids_p, ids_n[:, : ids_p.shape[1]])


def test_encode_native_oov_and_strip():
    vocab, _ = build_vocab_from_texts(["a b <p> yes <eos>"])
    ids, lens = native.encode_texts_native(
        ["UNSEEN a <p> yes <eos>"], vocab, max_len=10)
    # OOV -> pad; strip after '<p>'
    assert lens[0] == 3
    assert ids[0, 0] == vocab["<pad>"]
    assert ids[0, 2] == vocab["<p>"]
