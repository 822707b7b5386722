"""Tokenization conformance tests: vocab layout, IBTT byte-exactness vs the
reference grammar, fast-path equivalence, SENT structural properties."""

import numpy as np
import pytest

from glearning_benchmark_tpu.data import generator as G
from glearning_benchmark_tpu.data.graphs import Graph
from glearning_benchmark_tpu.data.zinc import load_zinc_split
from glearning_benchmark_tpu.tokenization import (
    SPECIAL,
    build_fixed_zinc_vocab,
    build_vocab_from_texts,
    collect_dynamic_tokens,
    encode_text,
    encode_texts,
    extend_vocab_with_dynamic_tokens,
    get_atom_type_id,
    get_bond_type_id,
    tokenize_zinc_molecule,
    zinc_label_token,
)
from glearning_benchmark_tpu.tokenization.ibtt import tokenize_zinc_corpus_ids
from glearning_benchmark_tpu.tokenization.pack import pad_sequences, pack_corpus
from glearning_benchmark_tpu.tokenization.sent import (
    EOS, LADJ, PAD, RADJ, RESET, SOS, TrailTokenizer,
)


def test_special_token_layout():
    # IDs 0..8 by position (reference: data_loader.py:10)
    assert SPECIAL == ["<pad>", "<bos>", "<e>", "<n>", "<q>", "<p>", "<eos>", "yes", "no"]
    vocab, itos = build_vocab_from_texts(["0 1 <e> <q> has_cycle <p> yes <eos>"])
    for i, tok in enumerate(SPECIAL):
        assert vocab[tok] == i


def test_fixed_zinc_vocab_layout():
    vocab, itos = build_fixed_zinc_vocab()
    assert vocab["<bos>"] == 0 and vocab["<eos>"] == 1 and vocab["<pad>"] == 2
    assert vocab["C"] == 8 and vocab["I"] == 16
    assert vocab["single"] == 17 and vocab["aromatic"] == 20
    assert vocab["regression"] == 21
    assert get_atom_type_id(0) == 8 and get_atom_type_id(8) == 16
    assert get_bond_type_id(1) == 17 and get_bond_type_id(4) == 20
    with pytest.raises(ValueError):
        get_atom_type_id(9)
    with pytest.raises(ValueError):
        get_bond_type_id(0)


def test_zinc_label_token_format():
    assert zinc_label_token(4.23) == "val_4_23"
    assert zinc_label_token(-2.10) == "val_neg2_10"
    assert zinc_label_token(0.0) == "val_0_00"


def test_zinc_tokenize_grammar():
    g = Graph(
        edges=np.array([[0, 1], [1, 0], [1, 2], [2, 1]], dtype=np.int32),
        num_nodes=3, y=1.5,
        node_labels=np.array([0, 1, 2], dtype=np.int32),  # C N O
        edge_labels=np.array([1, 1, 2, 2], dtype=np.int32),
    )
    text = tokenize_zinc_molecule(g)
    assert text == ("<bos> <atom> C <atom> N <atom> O "
                    "<bond> single 0 1 <bond> double 1 2 "
                    "<q> regression <p> val_1_50 <eos>")


def test_zinc_dedup_first_occurrence_order():
    # directed duplicated edges; dedup keeps first occurrence's orientation
    g = Graph(
        edges=np.array([[2, 0], [0, 2], [1, 0], [0, 1]], dtype=np.int32),
        num_nodes=3, y=0.0,
        node_labels=np.zeros(3, dtype=np.int32),
        edge_labels=np.array([1, 1, 2, 2], dtype=np.int32),
    )
    text = tokenize_zinc_molecule(g)
    assert "<bond> single 2 0" in text  # orientation of the first occurrence
    assert "<bond> double 1 0" in text
    assert text.count("<bond>") == 2


def test_encode_strip_and_oov():
    vocab, _ = build_vocab_from_texts(["0 1 <e> <q> has_cycle <p> yes <eos>"])
    ids = encode_text("0 1 <e> <q> has_cycle <p> yes <eos>", vocab, max_len=100)
    # stripped after <p> inclusive: label 'yes' and <eos> removed
    assert ids[-1] == vocab["<p>"]
    assert vocab["yes"] not in ids.tolist()[: len(ids)]
    ids2 = encode_text("UNKNOWN_TOKEN <p>", vocab, max_len=100)
    assert ids2[0] == vocab["<pad>"]  # OOV -> pad


def test_encode_texts_matches_encode_text():
    texts = []
    for algo in ("er", "ba", "path"):
        for seed in range(4):
            g = G.generate_graph(algo, seed)
            texts.append(G.cycle_check_records(g)[0]["text"])
    vocab, _ = build_vocab_from_texts(texts)
    ids, lens = encode_texts(texts, vocab, max_len=600)
    for i, t in enumerate(texts):
        one = encode_text(t, vocab, max_len=600)
        assert lens[i] == len(one)
        assert np.array_equal(ids[i, : lens[i]], one)
        assert (ids[i, lens[i]:] == vocab["<pad>"]).all()


def test_zinc_fast_path_equals_string_path():
    mols = load_zinc_split(split="val", limit=64)
    texts = [tokenize_zinc_molecule(m, max_len=1024) for m in mols]
    fv, _ = build_fixed_zinc_vocab()
    vocab = extend_vocab_with_dynamic_tokens(fv, collect_dynamic_tokens(texts, fv))
    ids_s, len_s = encode_texts(texts, vocab, max_len=1024)
    ids_f, len_f = tokenize_zinc_corpus_ids(mols, vocab, max_len=1024)
    assert np.array_equal(len_s, len_f)
    assert np.array_equal(ids_s, ids_f)


def test_zinc_truncation_keeps_eos():
    mols = load_zinc_split(split="val", limit=8)
    short = 40
    texts = [tokenize_zinc_molecule(m, max_len=short) for m in mols]
    for t in texts:
        toks = t.split()
        assert len(toks) <= short
        assert toks[-1] == "<eos>"
    fv, _ = build_fixed_zinc_vocab()
    vocab = extend_vocab_with_dynamic_tokens(fv, collect_dynamic_tokens(texts, fv))
    ids_s, len_s = encode_texts(texts, vocab, max_len=short)
    ids_f, len_f = tokenize_zinc_corpus_ids(mols, vocab, max_len=short)
    assert np.array_equal(len_s, len_f)
    assert np.array_equal(ids_s, ids_f)


def test_dynamic_vocab_deterministic():
    mols = load_zinc_split(split="val", limit=32)
    texts = [tokenize_zinc_molecule(m) for m in mols]
    fv, _ = build_fixed_zinc_vocab()
    v1 = extend_vocab_with_dynamic_tokens(fv, collect_dynamic_tokens(texts, fv))
    v2 = extend_vocab_with_dynamic_tokens(fv, collect_dynamic_tokens(texts, fv))
    assert v1 == v2
    # fixed block untouched
    for tok, i in fv.items():
        assert v1[tok] == i


# ---------------------------------------------------------------------------
# SENT
# ---------------------------------------------------------------------------

def _edges_from_tokens(tok: TrailTokenizer, tokens: np.ndarray):
    """Reconstruct the traversed edge multiset from an unlabeled trail."""
    idx0 = tok.idx_offset
    edges = set()
    prev = None
    for t in tokens:
        t = int(t)
        if t in (SOS, EOS):
            continue
        if t in (RESET, LADJ, RADJ):
            if t == RESET:
                prev = None
            continue
        node = t - idx0
        if prev is not None:
            edges.add(tuple(sorted((prev, node))))
        prev = node
    return edges


@pytest.mark.parametrize("algo", ["er", "ba", "path", "star", "sbm", "complete"])
def test_sent_covers_all_edges(algo):
    g = G.generate_graph(algo, 11)
    tok = TrailTokenizer(max_length=100000, truncation_length=100000)
    tok.set_num_nodes(g.num_nodes)
    tokens = tok(g)
    assert tokens[0] == SOS and tokens[-1] == EOS
    got = _edges_from_tokens(tok, tokens)
    want = {tuple(sorted(map(int, e))) for e in g.edges}
    assert got == want, f"trail cover lost/invented edges for {algo}"


def test_sent_deterministic():
    g = G.generate_graph("sbm", 5)
    tok = TrailTokenizer()
    tok.set_num_nodes(g.num_nodes)
    assert np.array_equal(tok(g), tok(g))


def test_sent_cycle_single_trail():
    # 4-cycle: Eulerian circuit -> single trail '<sos> 0 1 2 3 0 <eos>'
    g = Graph(edges=np.array([[0, 1], [1, 2], [2, 3], [3, 0]], dtype=np.int32),
              num_nodes=4, y=0)
    tok = TrailTokenizer()
    tok.set_num_nodes(4)
    t = tok(g)
    assert t.tolist() == [SOS, 6 + 0, 6 + 1, 6 + 2, 6 + 3, 6 + 0, EOS]


def test_sent_labeled_offsets():
    tok = TrailTokenizer(labeled_graph=True)
    tok.set_num_nodes(30)
    tok.set_num_node_and_edge_types(9, 4)
    assert tok.idx_offset == 6
    assert tok.node_idx_offset == 6 + 30
    assert tok.edge_idx_offset == 6 + 30 + 9
    g = Graph(edges=np.array([[0, 1]], dtype=np.int32), num_nodes=2, y=0.0,
              node_labels=np.array([0, 2], dtype=np.int32),
              edge_labels=np.array([2], dtype=np.int32))
    t = tok(g)
    # SOS pos0 lab(C) elab(double) pos1 lab(O) EOS
    assert t.tolist() == [SOS, 6, 36 + 0, 45 + 1, 7, 36 + 2, EOS]


def test_sent_remap_zinc():
    tok = TrailTokenizer(labeled_graph=True)
    tok.set_num_nodes(30)
    tok.set_num_node_and_edge_types(9, 4)
    fv, _ = build_fixed_zinc_vocab()
    raw = np.array([SOS, 6, 36, 45, 7, 38, EOS, RESET, PAD], dtype=np.int32)
    out = tok.remap_zinc_tokens(raw, fv)
    assert out.tolist() == [
        fv["<bos>"], 22 + 0, get_atom_type_id(0), get_bond_type_id(1),
        22 + 1, get_atom_type_id(2), fv["<eos>"], fv["<pad>"], fv["<pad>"],
    ]


def test_sent_query_append():
    tok = TrailTokenizer()
    tok.set_num_nodes(10)
    base = np.array([SOS, 6, 7, EOS], dtype=np.int32)
    out = tok.append_query(base, 2, 5)
    assert out.tolist() == [SOS, 6, 7, EOS, 6 + 10, 6 + 2, 6 + 5]
    assert tok.query_token_id == 16


def test_sent_truncation_keeps_eos():
    g = G.generate_graph("complete", 3)
    tok = TrailTokenizer(max_length=16, truncation_length=16)
    tok.set_num_nodes(g.num_nodes)
    t = tok(g)
    assert len(t) <= 16 and t[-1] == EOS


def test_pad_and_pack():
    seqs = [np.arange(3, dtype=np.int32), np.arange(7, dtype=np.int32)]
    ids, mask = pad_sequences(seqs, pad_id=99)
    assert ids.shape == (2, 7)
    assert ids[0, 3] == 99 and mask[0, 3] == False  # noqa: E712
    packed, pmask = pack_corpus(ids, np.array([3, 7]), pad_id=99)
    assert packed.shape[1] == 64  # bucketed
    assert (packed[:, 7:] == 99).all()
