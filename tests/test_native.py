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


def test_encode_native_whitespace_classes_match_python():
    # Python str.split() breaks on \r \v \f and the 0x1c-0x1f separators too;
    # the C tokenizer must agree byte-for-byte (CRLF corpora are the realistic
    # case), and unicode whitespace routes through the exact scalar path.
    vocab, _ = build_vocab_from_texts(["a b c <p> yes <eos>"])
    texts = ["a\rb \tc <p> yes", "a\x0bb\x0cc", "a\x1cb\x1dc\x1eb\x1fa",
             "a b c", "a b"]
    ids_p, lens_p = encode_texts(texts, vocab, max_len=16)
    ids_n, lens_n = native.encode_texts_native(texts, vocab, max_len=16)
    np.testing.assert_array_equal(lens_p, lens_n)
    np.testing.assert_array_equal(ids_p, ids_n[:, : ids_p.shape[1]])
    # non-ASCII corpus (U+00A0 is .isspace() in Python): exact-path reroute
    utexts = ["a\u00a0b c", "b a"]  # U+00A0 no-break space
    ids_pu, lens_pu = encode_texts(utexts, vocab, max_len=16)
    ids_nu, lens_nu = native.encode_texts_native(utexts, vocab, max_len=16)
    np.testing.assert_array_equal(lens_pu, lens_nu)
    np.testing.assert_array_equal(ids_pu, ids_nu[:, : ids_pu.shape[1]])


def test_encode_native_prebuilt_vocab_handle():
    # a prebuilt NativeVocab is reusable across calls (pad id travels with it)
    vocab, _ = build_vocab_from_texts(["a b <p> yes <eos>"])
    nv = native.NativeVocab(vocab)
    texts = ["a b <p> yes <eos>", "b a a <p> no"]
    ids_d, lens_d = native.encode_texts_native(texts, vocab, max_len=10)
    for _ in range(2):  # twice: the handle must survive reuse
        ids_h, lens_h = native.encode_texts_native(texts, nv, max_len=10)
        np.testing.assert_array_equal(ids_d, ids_h)
        np.testing.assert_array_equal(lens_d, lens_h)


# ---------------------------------------------------------------------------
# corpus scanner
# ---------------------------------------------------------------------------

def _load_both_ways(root, task, algos, split, **kw):
    """load_examples_multi_algorithm with the native scanner on vs forced off."""
    from unittest import mock

    from glearning_benchmark_tpu.data import loader

    fast = loader.load_examples_multi_algorithm(str(root), task, algos, split, **kw)
    with mock.patch.object(loader, "_scan_file_native", lambda *a: None):
        slow = loader.load_examples_multi_algorithm(str(root), task, algos, split, **kw)
    return fast, slow


@pytest.fixture(scope="module")
def scan_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("scan_corpus")
    G.generate_corpus(str(root), tasks=("cycle_check", "shortest_path"),
                      algorithms=("ba", "path", "er"), number_of_graphs=15)
    return root


def test_corpus_scan_cycle_identical(scan_corpus):
    fast, slow = _load_both_ways(scan_corpus, "cycle_check", ["ba", "er"], "train",
                                 seed=3)
    assert fast == slow and len(fast) == 30


def test_corpus_scan_sp_identical_sampled(scan_corpus):
    """Pair sampling must pick the same records in the same order (same RNG
    stream), including INF (label-None) entries."""
    for seed in (0, 7):
        fast, slow = _load_both_ways(
            scan_corpus, "shortest_path", ["path", "er"], "train",
            seed=seed, num_pairs_per_graph=10)
        assert fast == slow
        assert any(e["label"] is None for e in fast)  # INF pairs sampled too


def test_corpus_scan_sp_identical_unsampled(scan_corpus):
    fast, slow = _load_both_ways(scan_corpus, "shortest_path", ["path"], "val",
                                 seed=1)
    assert fast == slow and len(fast) > 0


def test_corpus_scan_strict_gate_falls_back(tmp_path):
    """Files outside the strict generator layout must scan to None (the
    Python format-tolerant reader then handles them)."""
    cases = {
        "jsonl.json": '{"text": "<bos> 0 1 <e> <q> has_cycle <p> yes <eos>"}\n'
                      '{"text": "<bos> <q> has_cycle <p> no <eos>"}',
        "extra_key.json": '[{"text": "<bos> <q> has_cycle <p> yes <eos>", "label": 1}]',
        "escape.json": '[{"text": "a \\u003cp> yes"}]',
        "nonascii.json": '[{"text": "café yes"}]',
        "raw.json": "<bos> 0 1 <e> <q> has_cycle <p> yes <eos>",
    }
    from glearning_benchmark_tpu.data.loader import _scan_file_native, load_examples
    for name, content in cases.items():
        fp = tmp_path / name
        fp.write_text(content)
        assert _scan_file_native(str(fp), "cycle_check") is None, name
    # and the overall loader still reads them through the fallback
    ex = load_examples(str(tmp_path / "*.json"), task="cycle_check")
    assert len(ex) == 6 and all(e["label"] in (0, 1) for e in ex)


def test_corpus_scan_accepts_strict_and_strips(tmp_path):
    from glearning_benchmark_tpu.data.loader import load_examples
    fp = tmp_path / "g.json"
    fp.write_text('[{"text": "  <bos> 0 1 <e> <n> 0 1 '
                  '<q> shortest_distance 0 1 <p> len1 <eos>  "},'
                  ' {"text": "<bos> <n> 0 <q> shortest_distance 0 0 <p> INF <eos>"}]')
    from glearning_benchmark_tpu.data.loader import _scan_file_native
    assert _scan_file_native(str(fp), "shortest_path") is not None
    ex = load_examples(str(tmp_path / "*.json"), task="shortest_path")
    assert ex[0]["text"].startswith("<bos>") and ex[0]["text"].endswith("<eos>")
    assert ex[0]["label"] == 0 and ex[0]["query_u"] == 0 and ex[0]["query_v"] == 1
    assert ex[1]["label"] is None


def test_edges_lexsorted_gate_native_matches_numpy():
    """The native fast-path gate (gtok_edges_lexsorted) must agree with the
    pure-numpy gate on every accept/reject class: mirrored-lexsorted (pass),
    self-loop, unmirrored reverse, duplicate directed edge, unsorted, and
    per-molecule mirror misses."""
    import numpy as np

    import glearning_benchmark_tpu.native as nat
    import glearning_benchmark_tpu.tokenization.ibtt_fast as ib

    if not nat.available():
        import pytest
        pytest.skip("native library unavailable")

    def numpy_gate(f):
        f = dict(f)
        f.pop("_lexsorted", None)
        real = nat.available
        nat.available = lambda: False
        try:
            return ib._edges_lexsorted_per_mol(f)
        finally:
            nat.available = real

    def case(n_nodes, src, dst, off):
        return dict(n_nodes=np.asarray(n_nodes),
                    src=np.asarray(src, np.int64),
                    dst=np.asarray(dst, np.int64),
                    edge_off=np.asarray(off, np.int64))

    cases = [
        case([3], [0, 1, 1, 2], [1, 0, 2, 1], [0, 4]),          # pass
        case([2], [0, 1], [0, 1], [0, 2]),                      # self-loop
        case([3], [2], [0], [0, 1]),                            # no fwd mirror
        case([3], [0, 0, 1, 1], [1, 1, 0, 0], [0, 4]),          # dup directed
        case([3], [1, 0], [0, 1], [0, 2]),                      # unsorted
        case([2, 3], [0, 1, 0, 2], [1, 0, 1, 1], [0, 2, 4]),    # mol2 miss
        case([4], [0, 1, 2, 3], [1, 2, 3, 0], [0, 4]),          # ring, no mirror
        case([2], [], [], [0, 0]),                              # empty
        # trailing zero-edge molecule: interior boundary == src.size used to
        # IndexError in the numpy gate (regression)
        case([3, 1], [0, 1, 1, 2], [1, 0, 2, 1], [0, 4, 4]),    # pass
        case([3, 1, 1], [0, 1, 1, 2], [1, 0, 2, 1], [0, 4, 4, 4]),  # 2 empty
        case([1, 3], [0, 1, 1, 2], [1, 0, 2, 1], [0, 0, 4]),    # leading empty
        case([3, 1], [1, 0, 1, 2], [0, 1, 2, 1], [0, 4, 4]),    # empty + unsorted
    ]
    for i, c in enumerate(cases):
        a = nat.edges_lexsorted_native(c)
        b = numpy_gate(c)
        assert a == b, f"case {i}: native={a} numpy={b}"


def test_pack_ids_native_matches_numpy():
    """gtok_pack_ids == pack_corpus's numpy semantics bit-for-bit (pad tail,
    bool mask from lens), including lens > bucket clamping."""
    rng = np.random.default_rng(0)
    n, l, lb = 700, 37, 64
    ids = rng.integers(0, 99, size=(n, l)).astype(np.int32)
    lens = rng.integers(0, l + 1, size=n).astype(np.int32)
    lens[0] = lb + 5  # over-long row: mask must clamp to all-True
    out, mask = native.pack_ids_native(ids, lens, lb, pad_id=7)
    ref = np.full((n, lb), 7, dtype=np.int32)
    ref[:, :l] = ids
    refm = np.arange(lb)[None, :] < lens[:, None]
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(mask, refm)
    assert mask.dtype == bool


def test_zinc_encode_native_threaded_matches_sequential(monkeypatch):
    """The threaded molecule shards write disjoint rows: GTOK_THREADS=4 must
    be bit-identical to GTOK_THREADS=1 (n_gtok_threads reads the env per
    call via std::getenv, and os.environ writes putenv through to C)."""
    from glearning_benchmark_tpu.tokenization.ibtt_fast import (
        build_zinc_vocab_fast, flatten_zinc_corpus)
    mols = load_zinc_split(split="val", limit=200)
    flat = flatten_zinc_corpus(list(mols))
    vocab = build_zinc_vocab_fast(mols, flat=flat)
    monkeypatch.setenv("GTOK_THREADS", "4")
    # min_per_thread would force 1 thread at only 200 mols; replicate the
    # corpus so the pool really shards (shard boundaries land mid-corpus)
    big = list(mols) * 40
    big_flat = flatten_zinc_corpus(big)
    a = native.zinc_encode_native(dict(big_flat), vocab, max_len=1024)
    s1 = native.zinc_vocab_stream_native(dict(big_flat))
    monkeypatch.setenv("GTOK_THREADS", "1")
    b = native.zinc_encode_native(dict(big_flat), vocab, max_len=1024)
    s2 = native.zinc_vocab_stream_native(dict(big_flat))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(s1[0], s2[0])
    assert s1[1] == s2[1]


def test_pack_ids_native_negative_length():
    """Negative lens must clamp to an all-False mask row (numpy semantics:
    arange < negative is all False), never a giant memset."""
    ids = np.arange(12, dtype=np.int32).reshape(2, 6)
    lens = np.array([-3, 4], dtype=np.int32)
    out, mask = native.pack_ids_native(ids, lens, 8, pad_id=0)
    assert not mask[0].any()
    assert mask[1, :4].all() and not mask[1, 4:].any()


def test_zinc_vocab_stream_out_of_range_node_errors():
    """An edge referencing a node index beyond the corpus max must error
    (python wrapper raises; callers fall back to the exact path) instead of
    indexing past the dedup table."""
    flat = {
        "n_nodes": np.array([3], dtype=np.int64),
        "n_edges": np.array([2], dtype=np.int64),
        "node_off": np.array([0, 3], dtype=np.int64),
        "edge_off": np.array([0, 2], dtype=np.int64),
        "atoms": np.zeros(3, dtype=np.int64),
        "src": np.array([0, 1], dtype=np.int64),
        "dst": np.array([99, 2], dtype=np.int64),  # 99 >> max_nodes
        "bond": np.ones(2, dtype=np.int64),
        "y": np.zeros(1, dtype=np.float64),
    }
    with pytest.raises(RuntimeError):
        native.zinc_vocab_stream_native(flat)


def test_fast_fmt_2f_matches_python():
    """The native fast "%.2f" path (gtok.cpp fast_fmt_2f — fma-exact
    round-half-even + integer formatting, snprintf fallback for non-finite /
    huge / near-tie values) is byte-equal to Python's f"{y:.2f}", which is
    the ZINC label contract (tokenization/ibtt.py zinc_label_token,
    reference zinc_dataset_indexbase.py:192-193)."""
    import ctypes
    import random
    import struct

    lib = native.get_lib()
    buf = ctypes.create_string_buffer(1024)
    rng = random.Random(0)
    cases = [rng.uniform(-300, 300) for _ in range(500)]
    cases += [rng.uniform(-3, 3) for _ in range(500)]
    # classic decimal ties x.xx5 and multiples of 0.005
    for k in range(-500, 500):
        cases += [k / 100 + 0.005, k * 0.005]
    # magnitude sweep incl. the fast path's 2e15 guard boundary
    for e in range(-10, 17):
        cases += [rng.uniform(-1, 1) * 10**e for _ in range(50)]
    # random finite bit patterns
    for _ in range(1000):
        y = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if y == y and abs(y) != float("inf"):
            cases.append(y)
    cases += [0.0, -0.0, -0.001, 0.125, -0.125, 2.675, -2.675, 1e15, -1e15,
              2.0e13, -2.0e13, float("nan"), float("inf"), float("-inf")]
    n_fast = 0
    for y in cases:
        r = lib.gtok_fmt_2f(y, buf, 1024)
        assert buf.value.decode() == f"{y:.2f}", repr(y)
        n_fast += r == 1
    # the fast path must actually engage on the common label range
    assert n_fast > len(cases) // 3


def test_sent_native_fuzz_adversarial_graphs():
    """Random graphs stressing the walker's scratch reuse: duplicate and
    mirrored edges (dedup bitmap), isolated nodes (singleton trails),
    multi-component graphs, n=1. Bit-identical to the Python TrailTokenizer
    in both labeled and unlabeled modes."""
    from glearning_benchmark_tpu.data.generator import Graph

    rng = np.random.default_rng(7)
    graphs = []
    for trial in range(120):
        n = int(rng.integers(1, 60))
        e = int(rng.integers(0, max(1, n * 3)))
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        keep = src != dst
        edges = np.stack([src[keep], dst[keep]], 1).astype(np.int32)
        if len(edges) and trial % 3 == 0:  # mirrors + duplicates
            edges = np.concatenate([edges, edges[::-1][:, ::-1], edges[:3]])
        graphs.append(Graph(
            edges=edges, num_nodes=n, y=0.0,
            node_labels=rng.integers(0, 9, n).astype(np.int32),
            edge_labels=rng.integers(1, 5, len(edges)).astype(np.int32)))
    for labeled in (False, True):
        tok = TrailTokenizer(max_length=700, truncation_length=700,
                             labeled_graph=labeled)
        tok.set_num_nodes(max(g.num_nodes for g in graphs))
        kw = dict(labeled=labeled)
        if labeled:
            tok.set_num_node_and_edge_types(9, 4)
            kw.update(node_idx_offset=tok.node_idx_offset,
                      edge_idx_offset=tok.edge_idx_offset)
        ids, lens = native.sent_tokenize_batch_native(
            graphs, tok.idx_offset, 700, **kw)
        for i, g in enumerate(graphs):
            np.testing.assert_array_equal(tok(g), ids[i, :lens[i]])
