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
