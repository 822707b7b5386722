"""Golden conformance: our implementations vs outputs captured from the
ACTUAL reference code (tools/capture_golden.py). Runs without the reference
tree mounted — the goldens are frozen in tests/golden/."""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_golden.json")
pytestmark = pytest.mark.skipif(not os.path.isfile(GOLDEN),
                                reason="golden corpus not captured")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_vocab_matches_golden(golden):
    from glearning_benchmark_tpu.tokenization import build_vocab_from_texts
    vocab, _ = build_vocab_from_texts(golden["synthetic_texts"])
    assert vocab == golden["synthetic_vocab"]


def test_encodings_match_golden(golden):
    from glearning_benchmark_tpu.tokenization import encode_text
    vocab = golden["synthetic_vocab"]
    for text, want in zip(golden["synthetic_texts"], golden["synthetic_encodings"]):
        got = encode_text(text, vocab, max_len=600)
        assert got.tolist() == want


def test_fixed_zinc_vocab_matches_golden(golden):
    from glearning_benchmark_tpu.tokenization import build_fixed_zinc_vocab
    fv, _ = build_fixed_zinc_vocab()
    assert fv == golden["fixed_zinc_vocab"]


def test_zinc_serialization_matches_golden(golden):
    from glearning_benchmark_tpu.data.graphs import Graph
    from glearning_benchmark_tpu.tokenization import tokenize_zinc_molecule
    for rec in golden["zinc_molecules"]:
        g = Graph(edges=np.asarray(rec["edges"], dtype=np.int32),
                  num_nodes=rec["num_nodes"], y=rec["y"],
                  node_labels=np.asarray(rec["node_labels"], dtype=np.int32),
                  edge_labels=np.asarray(rec["edge_labels"], dtype=np.int32))
        assert tokenize_zinc_molecule(g) == rec["text"]


def test_native_encode_matches_golden(golden):
    """The C++ path against reference-captured strings, end to end."""
    native = pytest.importorskip("glearning_benchmark_tpu.native")
    if not native.available():
        pytest.skip("native library unavailable")
    from glearning_benchmark_tpu.data.graphs import Graph
    from glearning_benchmark_tpu.tokenization import build_fixed_zinc_vocab
    from glearning_benchmark_tpu.tokenization.ibtt import encode_texts
    from glearning_benchmark_tpu.tokenization.ibtt_fast import (
        build_zinc_vocab_fast, corpus_ids_best)
    mols = [Graph(edges=np.asarray(r["edges"], dtype=np.int32),
                  num_nodes=r["num_nodes"], y=r["y"],
                  node_labels=np.asarray(r["node_labels"], dtype=np.int32),
                  edge_labels=np.asarray(r["edge_labels"], dtype=np.int32))
            for r in golden["zinc_molecules"]]
    vocab = build_zinc_vocab_fast(mols)
    ids_fast, lens_fast = corpus_ids_best(mols, vocab, max_len=1024)
    texts = [r["text"] for r in golden["zinc_molecules"]]
    ids_str, lens_str = encode_texts(texts, vocab, max_len=1024)
    assert np.array_equal(lens_fast, lens_str)
    w = min(ids_fast.shape[1], ids_str.shape[1])
    assert np.array_equal(ids_fast[:, :w], ids_str[:, :w])
