"""Vectorized ZINC pipeline conformance: byte-exact against the scalar path
(which is itself byte-exact against the string grammar)."""

import numpy as np

from glearning_benchmark_tpu.data.graphs import Graph
from glearning_benchmark_tpu.data.zinc import load_zinc_split
from glearning_benchmark_tpu.tokenization.ibtt import (
    tokenize_zinc_corpus_ids,
    tokenize_zinc_molecule,
)
from glearning_benchmark_tpu.tokenization.ibtt_fast import (
    build_zinc_vocab_fast,
    corpus_ids_vectorized,
    flatten_zinc_corpus,
)
from glearning_benchmark_tpu.tokenization.vocab import (
    build_fixed_zinc_vocab,
    collect_dynamic_tokens,
    extend_vocab_with_dynamic_tokens,
)


def _string_vocab(mols, max_len=1024):
    fixed, _ = build_fixed_zinc_vocab()
    texts = [tokenize_zinc_molecule(m, max_len=max_len) for m in mols]
    return extend_vocab_with_dynamic_tokens(fixed, collect_dynamic_tokens(texts, fixed))


def test_fast_vocab_matches_string_path():
    mols = load_zinc_split(split="val", limit=200)
    assert build_zinc_vocab_fast(mols) == _string_vocab(mols)


def test_vectorized_ids_match_scalar():
    mols = load_zinc_split(split="val", limit=200)
    vocab = build_zinc_vocab_fast(mols)
    ids_v, lens_v = corpus_ids_vectorized(mols, vocab, max_len=1024)
    ids_s, lens_s = tokenize_zinc_corpus_ids(mols, vocab, max_len=1024)
    assert np.array_equal(lens_v, lens_s)
    l = ids_s.shape[1]
    assert np.array_equal(ids_v[:, :l], ids_s)
    assert (ids_v[:, l:] == vocab["<pad>"]).all()


def test_vectorized_truncation_fallback():
    mols = load_zinc_split(split="val", limit=64)
    vocab = build_zinc_vocab_fast(mols)
    for max_len in (40, 60, 120):
        ids_v, lens_v = corpus_ids_vectorized(mols, vocab, max_len=max_len)
        ids_s, lens_s = tokenize_zinc_corpus_ids(mols, vocab, max_len=max_len)
        assert np.array_equal(lens_v, lens_s), max_len
        l = ids_s.shape[1]
        assert np.array_equal(ids_v[:, :l], ids_s), max_len


def test_unsorted_edges_fall_back_exactly():
    mols = list(load_zinc_split(split="val", limit=8))
    # scramble one molecule's directed edge order (breaks the lexsort
    # precondition) — result must still match the scalar path bit-for-bit
    from glearning_benchmark_tpu.data.graphs import Graph
    m = mols[3]
    rng = np.random.default_rng(0)
    perm = rng.permutation(m.edges.shape[0])
    mols[3] = Graph(edges=m.edges[perm], num_nodes=m.num_nodes, y=m.y,
                    node_labels=m.node_labels, edge_labels=m.edge_labels[perm])
    vocab = _string_vocab(mols)
    ids_v, lens_v = corpus_ids_vectorized(mols, vocab, max_len=1024)
    ids_s, lens_s = tokenize_zinc_corpus_ids(mols, vocab, max_len=1024)
    assert np.array_equal(lens_v, lens_s)
    assert np.array_equal(ids_v[:, : ids_s.shape[1]], ids_s)


def test_flatten_offsets():
    mols = load_zinc_split(split="val", limit=10)
    flat = flatten_zinc_corpus(mols)
    assert flat["node_off"][-1] == sum(m.num_nodes for m in mols)
    assert flat["edge_off"][-1] == sum(m.edges.shape[0] for m in mols)
    assert flat["atoms"].shape[0] == flat["node_off"][-1]


def _remake(m, edges, edge_labels):
    from glearning_benchmark_tpu.data.graphs import Graph
    return Graph(edges=np.asarray(edges, np.int32), num_nodes=m.num_nodes,
                 y=m.y, node_labels=m.node_labels,
                 edge_labels=np.asarray(edge_labels, np.int32))


def test_duplicate_directed_edge_falls_back_exactly():
    # a duplicated directed edge passes a non-strict lexsort but is kept
    # twice by the raw fast paths and once by the scalar path — the strict
    # gate must route such corpora through the scalar path
    from glearning_benchmark_tpu.tokenization.ibtt_fast import (
        _edges_lexsorted_per_mol,
        corpus_ids_best,
    )
    mols = list(load_zinc_split(split="val", limit=8))
    m = mols[2]
    dup = np.concatenate([m.edges[:1], m.edges], axis=0)
    dlab = np.concatenate([m.edge_labels[:1], m.edge_labels])
    mols[2] = _remake(m, dup, dlab)
    flat = flatten_zinc_corpus(mols)
    assert not _edges_lexsorted_per_mol(flat)
    vocab = _string_vocab(mols)
    for fn in (corpus_ids_vectorized, corpus_ids_best):
        ids_v, lens_v = fn(mols, vocab, max_len=1024)
        ids_s, lens_s = tokenize_zinc_corpus_ids(mols, vocab, max_len=1024)
        assert np.array_equal(lens_v, lens_s)
        assert np.array_equal(ids_v[:, : ids_s.shape[1]], ids_s)


def test_unmirrored_reversed_edge_falls_back_exactly():
    # a lexsorted list whose only record of a bond is the (hi, lo) direction:
    # the src<dst subsequence would DROP that bond, so the gate must reject
    from glearning_benchmark_tpu.tokenization.ibtt_fast import (
        _edges_lexsorted_per_mol,
        corpus_ids_best,
    )
    mols = list(load_zinc_split(split="val", limit=8))
    m = mols[1]
    keep = m.edges[:, 0] > m.edges[:, 1]  # reversed-direction copies only
    assert keep.any()
    mols[1] = _remake(m, m.edges[keep], m.edge_labels[keep])
    flat = flatten_zinc_corpus(mols)
    assert not _edges_lexsorted_per_mol(flat)
    vocab = _string_vocab(mols)
    for fn in (corpus_ids_vectorized, corpus_ids_best):
        ids_v, lens_v = fn(mols, vocab, max_len=1024)
        ids_s, lens_s = tokenize_zinc_corpus_ids(mols, vocab, max_len=1024)
        assert np.array_equal(lens_v, lens_s)
        assert np.array_equal(ids_v[:, : ids_s.shape[1]], ids_s)


def test_native_encode_single_direction_buffer_sizing():
    # single-direction (src < dst only) lexsorted lists pass the gate but
    # keep E (not E/2) bonds — the native buffer must be sized from actual
    # kept counts, not n_edges/2 (heap overflow regression, ADVICE r1)
    import pytest

    from glearning_benchmark_tpu import native as gnative
    from glearning_benchmark_tpu.tokenization.ibtt_fast import (
        _edges_lexsorted_per_mol,
        corpus_ids_best,
    )
    if not gnative.available():
        pytest.skip("native library unavailable")
    mols = list(load_zinc_split(split="val", limit=16))
    halved = []
    for m in mols:
        keep = m.edges[:, 0] < m.edges[:, 1]
        halved.append(_remake(m, m.edges[keep], m.edge_labels[keep]))
    flat = flatten_zinc_corpus(halved)
    assert _edges_lexsorted_per_mol(flat)
    vocab = _string_vocab(halved)
    ids_n, lens_n, trunc = gnative.zinc_encode_native(
        flatten_zinc_corpus(halved), vocab, max_len=1024)
    ids_s, lens_s = tokenize_zinc_corpus_ids(halved, vocab, max_len=1024)
    assert not trunc.any()
    assert np.array_equal(lens_n, lens_s)
    assert np.array_equal(ids_n[:, : ids_s.shape[1]], ids_s)
    ids_b, lens_b = corpus_ids_best(halved, vocab, max_len=1024)
    assert np.array_equal(lens_b, lens_s)
    assert np.array_equal(ids_b[:, : ids_s.shape[1]], ids_s)


def test_corpus_carried_flat_reused_and_exact():
    """load_zinc_split returns a GraphCorpus carrying its flat form;
    flatten_zinc_corpus must reuse it (identity) and the carried form must
    equal a from-scratch flatten of the same molecules field-for-field."""
    corpus = load_zinc_split(split="val", limit=120)
    assert getattr(corpus, "flat", None) is not None
    reused = flatten_zinc_corpus(corpus)
    assert reused is corpus.flat
    fresh = flatten_zinc_corpus(list(corpus))
    for k in fresh:
        np.testing.assert_array_equal(reused[k], fresh[k], err_msg=k)


def test_corpus_carried_flat_mutation_falls_back():
    """If a molecule no longer matches the carried flat (post-load mutation),
    the spot-check must reject it and flatten must recompute."""
    corpus = load_zinc_split(split="val", limit=50)
    # one of the eight spot-check sample indices (k=3 of 7 spread points)
    idx = (len(corpus) - 1) * 3 // 7
    g = corpus[idx]
    corpus[idx] = Graph(edges=g.edges, num_nodes=g.num_nodes, y=g.y + 1.0,
                        node_labels=g.node_labels, edge_labels=g.edge_labels)
    flat = flatten_zinc_corpus(corpus)
    assert flat is not corpus.flat
    assert flat["y"][idx] == g.y + 1.0


def test_corpus_carried_flat_edge_label_mutation_falls_back():
    """Replacing a sampled molecule with one differing ONLY in edge labels
    must defeat the spot-check (bond types feed the tokenization)."""
    corpus = load_zinc_split(split="val", limit=50)
    g = corpus[-1]
    new_el = g.edge_labels.copy()
    new_el[0] = (new_el[0] % 4) + 1  # different valid bond type
    corpus[-1] = Graph(edges=g.edges, num_nodes=g.num_nodes, y=g.y,
                       node_labels=g.node_labels, edge_labels=new_el)
    flat = flatten_zinc_corpus(corpus)
    assert flat is not corpus.flat
    assert flat["bond"][-1] == new_el[-1]
