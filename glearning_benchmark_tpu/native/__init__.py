"""ctypes bindings to the native host tokenization core (native/gtok.cpp).

Built lazily with ``make`` on first use; every entry point has a pure-Python
fallback (the implementations in :mod:`..tokenization`), so the framework
works without a compiler — the native path is a host-throughput optimization
for SENT trail walks and corpus text encoding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgtok.so")

_lib = None
_tried = False


def _build(force: bool = False) -> bool:
    try:
        cmd = ["make", "-C", _NATIVE_DIR] + (["-B"] if force else [])
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def _so_is_stale() -> bool:
    """True when gtok.cpp is newer than the built .so (e.g. after a pull
    that left an old untracked .so behind)."""
    try:
        src = os.path.getmtime(os.path.join(_NATIVE_DIR, "gtok.cpp"))
        return os.path.getmtime(_LIB_PATH) < src
    except OSError:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # rebuild BEFORE the first dlopen when the source is newer than the .so:
    # once a path is mapped, a no-op rebuild reloads the same handle (glibc
    # dedups dlopen by dev/inode and ctypes never dlcloses)
    if (not os.path.isfile(_LIB_PATH) or _so_is_stale()) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # stale .so predating newer entry points with a misleading fresh mtime
    # (e.g. copied from another checkout): unlink + force-rebuild so the
    # fresh library lands on a NEW inode — glibc dedups dlopen by dev/inode,
    # so an in-place relink would hand back the cached stale handle
    if not hasattr(lib, "gtok_fmt_2f"):
        try:
            os.remove(_LIB_PATH)
        except OSError:
            pass
        if not _build(force=True):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        if not hasattr(lib, "gtok_fmt_2f"):
            return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gtok_vocab_create.restype = ctypes.c_void_p
    lib.gtok_vocab_create.argtypes = [ctypes.c_char_p, i64p, ctypes.c_int32, i32p]
    lib.gtok_vocab_free.argtypes = [ctypes.c_void_p]
    lib.gtok_encode_texts.restype = ctypes.c_int32
    lib.gtok_encode_texts.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, i64p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, i32p]
    lib.gtok_sent_tokenize_batch.restype = ctypes.c_int32
    lib.gtok_sent_tokenize_batch.argtypes = [
        i32p, i32p, i32p, i64p, i32p, i32p, i64p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, i32p]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gtok_zinc_encode.restype = ctypes.c_int32
    lib.gtok_zinc_encode.argtypes = [
        i32p, i64p, i32p, i32p, i32p, i64p, ctypes.c_int32,
        i32p, i32p, i32p, i32p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, u8p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.gtok_zinc_vocab_stream.restype = ctypes.c_int32
    lib.gtok_zinc_vocab_stream.argtypes = [
        i32p, i32p, i64p, f64p, ctypes.c_int32, ctypes.c_int32,
        i64p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int64]
    # test hook: fast "%.2f" formatter (tests/test_native.py cross-checks
    # the bytes against Python's f"{y:.2f}")
    lib.gtok_fmt_2f.restype = ctypes.c_int32
    lib.gtok_fmt_2f.argtypes = [ctypes.c_double, ctypes.c_char_p,
                                ctypes.c_int32]
    lib.gtok_edges_lexsorted.restype = ctypes.c_int32
    lib.gtok_edges_lexsorted.argtypes = [i32p, i32p, i64p, ctypes.c_int32]
    lib.gtok_zinc_lmax.restype = ctypes.c_int64
    lib.gtok_zinc_lmax.argtypes = [i32p, i32p, i64p, i32p, ctypes.c_int32]
    u8p_pack = ctypes.POINTER(ctypes.c_uint8)
    lib.gtok_pack_ids.restype = None
    lib.gtok_pack_ids.argtypes = [
        i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, u8p_pack]
    lib.gtok_corpus_scan.restype = ctypes.c_void_p
    lib.gtok_corpus_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, i64p]
    lib.gtok_corpus_fill.argtypes = [
        ctypes.c_void_p, i64p, i64p, i32p, i32p, i32p, i32p]
    lib.gtok_corpus_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# libgstats.so — graphlet orbit counting (native/gstats.cpp), the ORCA-
# equivalent host component for generation-quality evaluation (the reference
# env compiles AutoGraph's ORCA for this, docs/setup.md:30-36)
# ---------------------------------------------------------------------------

_GSTATS_PATH = os.path.join(_NATIVE_DIR, "libgstats.so")
_gstats = None
_gstats_tried = False


def _gstats_is_stale() -> bool:
    """True when gstats.cpp is newer than the built .so (same hazard as
    _so_is_stale: a pull leaves an old untracked binary behind)."""
    try:
        src = os.path.getmtime(os.path.join(_NATIVE_DIR, "gstats.cpp"))
        return os.path.getmtime(_GSTATS_PATH) < src
    except OSError:
        return False


def get_gstats():
    """Load (building if needed) the orbit-count library; None if unavailable."""
    global _gstats, _gstats_tried
    if _gstats is not None or _gstats_tried:
        return _gstats
    _gstats_tried = True
    # rebuild BEFORE the first dlopen when the source is newer (see get_lib)
    if (not os.path.isfile(_GSTATS_PATH) or _gstats_is_stale()) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_GSTATS_PATH)
    except OSError:
        return None
    if not hasattr(lib, "gstats_orbit_counts_batch"):
        # stale .so predating the symbol with a fresh mtime (e.g. copied from
        # another checkout): unlink + force-rebuild onto a NEW inode — glibc
        # dedups dlopen by dev/inode, an in-place relink returns the stale
        # handle (same recovery as get_lib)
        try:
            os.remove(_GSTATS_PATH)
        except OSError:
            pass
        if not _build(force=True):
            return None
        try:
            lib = ctypes.CDLL(_GSTATS_PATH)
        except OSError:
            return None
        if not hasattr(lib, "gstats_orbit_counts_batch"):
            return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gstats_orbit_counts_batch.restype = ctypes.c_int32
    lib.gstats_orbit_counts_batch.argtypes = [
        i32p, i32p, i64p, i32p, i64p, ctypes.c_int32, i64p]
    _gstats = lib
    return _gstats


def gstats_available() -> bool:
    return get_gstats() is not None


def orbit_counts_batch_native(edges_list, n_nodes_list) -> np.ndarray:
    """Per-node graphlet orbit counts (ORCA orbits 0-14) for a batch of
    graphs. ``edges_list[g]`` is an [E_g, 2] int array (undirected, either
    or both directions); returns int64 [sum(n_nodes), 15] with graph g's
    rows at ``offsets[g]:offsets[g]+n_nodes[g]`` where offsets = cumsum."""
    lib = get_gstats()
    if lib is None:
        raise RuntimeError("native gstats library unavailable")
    n_graphs = len(n_nodes_list)
    n_nodes = np.asarray(n_nodes_list, dtype=np.int32)
    e_counts = np.array([len(e) for e in edges_list], dtype=np.int64)
    edge_off = np.zeros(n_graphs + 1, dtype=np.int64)
    np.cumsum(e_counts, out=edge_off[1:])
    node_off = np.zeros(n_graphs + 1, dtype=np.int64)
    np.cumsum(n_nodes.astype(np.int64), out=node_off[1:])
    if edge_off[-1]:
        flat = np.concatenate([np.asarray(e, dtype=np.int32).reshape(-1, 2)
                               for e in edges_list if len(e)])
    else:
        flat = np.zeros((0, 2), dtype=np.int32)
    src = np.ascontiguousarray(flat[:, 0], dtype=np.int32)
    dst = np.ascontiguousarray(flat[:, 1], dtype=np.int32)
    counts = np.zeros((int(node_off[-1]), 15), dtype=np.int64)
    rc = lib.gstats_orbit_counts_batch(
        _i32p(src), _i32p(dst), _i64p(edge_off), _i32p(n_nodes),
        _i64p(node_off), n_graphs,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError(f"gstats_orbit_counts_batch failed at graph {-rc - 1}")
    return counts


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _flat_as(flat, key: str, dtype) -> np.ndarray:
    """Contiguous dtype view/copy of a flat-corpus field, cached in the flat
    dict (keys prefixed ``_as:``) — the same flat dict is threaded through
    vocab build / encode / gate calls, so each field converts at most once
    per corpus instead of once per native call."""
    dt = np.dtype(dtype)
    ck = f"_as:{key}:{dt.name}"
    a = flat.get(ck)
    if a is None:
        a = np.ascontiguousarray(flat[key], dtype=dt)
        flat[ck] = a
    return a


class NativeVocab:
    """Native hash-map vocab handle."""

    def __init__(self, vocab: Dict[str, int]):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        toks = list(vocab)
        blob = "".join(toks).encode("utf-8")
        offs = np.zeros(len(toks) + 1, dtype=np.int64)
        np.cumsum([len(t.encode("utf-8")) for t in toks], out=offs[1:])
        ids = np.asarray([vocab[t] for t in toks], dtype=np.int32)
        self._lib = lib
        self._handle = lib.gtok_vocab_create(blob, _i64p(offs), len(toks), _i32p(ids))
        # kept so a prebuilt handle is usable across encode_texts_native calls
        self.pad_id: Optional[int] = vocab.get("<pad>")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.gtok_vocab_free(self._handle)
            self._handle = None


def encode_texts_native(
    texts: Sequence[str],
    vocab: Dict[str, int] | NativeVocab,
    max_len: int = 512,
    strip_label: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native whole-corpus text encode; semantics of tokenization.ibtt.encode_text."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nv = vocab if isinstance(vocab, NativeVocab) else NativeVocab(vocab)
    pad_id = vocab["<pad>"] if isinstance(vocab, dict) else nv.pad_id
    if pad_id is None:
        raise ValueError("vocab has no <pad> id")
    blob = "\n".join(texts).encode("utf-8")
    if not blob.isascii():
        # Python str.split() also breaks on unicode whitespace (U+00A0, …)
        # which the byte-level C tokenizer cannot see; keep native == scalar
        # bit-for-bit by routing non-ASCII corpora through the exact path.
        # ASCII-ness is one C-speed scan; the token grammar is ASCII, so
        # production corpora never take this branch.
        if not isinstance(vocab, dict):
            raise ValueError("non-ASCII texts need the vocab dict (scalar path)")
        from ..tokenization.ibtt import encode_text
        rows = [encode_text(t, vocab, max_len=max_len, strip_label=strip_label)
                for t in texts]
        lens = np.asarray([len(r) for r in rows], dtype=np.int32)
        l = int(lens.max()) if len(texts) else 0
        ids = np.full((len(texts), l), pad_id, dtype=np.int32)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = r
        return ids, lens
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(t.encode("utf-8")) + 1 for t in texts], out=offs[1:])
    offs[-1] -= 1  # no trailing separator
    ids = np.empty((len(texts), max_len), dtype=np.int32)
    lens = np.empty(len(texts), dtype=np.int32)
    rc = lib.gtok_encode_texts(nv._handle, blob, _i64p(offs), len(texts),
                               max_len, pad_id, int(strip_label),
                               _i32p(ids), _i32p(lens))
    if rc != 0:
        raise RuntimeError(f"gtok_encode_texts failed: {rc}")
    l = int(lens.max()) if len(texts) else 0
    return ids[:, :l].copy(), lens


def edges_lexsorted_native(flat) -> bool:
    """Native fast-path gate (gtok_edges_lexsorted): exact semantics of
    ibtt_fast._edges_lexsorted_per_mol's numpy checks in one O(E log deg)
    pass with no temporaries."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = _flat_as(flat, "src", np.int32)
    dst = _flat_as(flat, "dst", np.int32)
    edge_off = _flat_as(flat, "edge_off", np.int64)
    n_mols = len(flat["n_nodes"])
    return bool(lib.gtok_edges_lexsorted(_i32p(src), _i32p(dst),
                                         _i64p(edge_off), n_mols))


def zinc_vocab_stream_native(flat):
    """Dynamic-token codes in first-occurrence order + label strings.

    Returns (codes int64 array, label_strs list). Codes <= max_nodes are node
    indices; codes > max_nodes are max_nodes+1+label_rank. Semantics of
    tokenization.ibtt_fast.build_zinc_vocab_fast's discovery stage."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = len(flat["n_nodes"])
    max_nodes = int(flat["n_nodes"].max()) if b else 0
    src = _flat_as(flat, "src", np.int32)
    dst = _flat_as(flat, "dst", np.int32)
    edge_off = _flat_as(flat, "edge_off", np.int64)
    y = _flat_as(flat, "y", np.float64)
    cap = max_nodes + 2 + b  # node indices + one label per molecule, upper bound
    codes = np.empty(cap, dtype=np.int64)
    blob = ctypes.create_string_buffer(b * 24 + 16)
    n = lib.gtok_zinc_vocab_stream(
        _i32p(src), _i32p(dst), _i64p(edge_off),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b, max_nodes,
        _i64p(codes), cap, blob, len(blob))
    if n < 0:
        raise RuntimeError("gtok_zinc_vocab_stream buffer overflow")
    labels = blob.value.decode("utf-8").split("\n")
    labels = [s for s in labels if s]
    return codes[:n], labels


def zinc_encode_native(flat, vocab, max_len: int = 1024):
    """Native whole-corpus ZINC IBTT encode over flat arrays (see
    tokenization.ibtt_fast.flatten_zinc_corpus). Returns (ids, lens,
    trunc_mask); rows flagged in trunc_mask need the exact scalar-path
    patch. Requires lexsorted directed edges (caller checks)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # one id-table builder shared with the numpy path (ibtt_fast._id_tables)
    # — the native==numpy byte-exactness invariant rides on these tables
    from ..tokenization.ibtt_fast import _id_tables

    b = len(flat["n_nodes"])
    pad = vocab["<pad>"]
    max_nodes = int(flat["n_nodes"].max()) if b else 0
    atom_ids, bond_ids, index_ids = _id_tables(vocab, max_nodes)
    tail_ids = np.asarray([vocab["<q>"], vocab["regression"], vocab["<p>"],
                           vocab["<atom>"], vocab["<bond>"]], dtype=np.int32)
    atoms = _flat_as(flat, "atoms", np.int32)
    src = _flat_as(flat, "src", np.int32)
    dst = _flat_as(flat, "dst", np.int32)
    bond = _flat_as(flat, "bond", np.int32)
    node_off = _flat_as(flat, "node_off", np.int64)
    edge_off = _flat_as(flat, "edge_off", np.int64)
    # exact l_max from the ACTUAL kept (src < dst) edge counts — sizing from
    # n_edges/2 assumes a mirrored edge list and under-allocates for
    # single-direction inputs (the C side also bounds-checks, returning an
    # error instead of writing past the buffer). Computed natively
    # (gtok_zinc_lmax, one threaded pass) — the numpy keep/cumsum chain this
    # replaces cost more than the encode kernel itself.
    l_max = flat.get("_l_max")
    if l_max is None:
        nn32 = _flat_as(flat, "n_nodes", np.int32)
        l_max = int(lib.gtok_zinc_lmax(_i32p(src), _i32p(dst),
                                       _i64p(edge_off), _i32p(nn32), b)) \
            if b else 1
        flat["_l_max"] = l_max
    out = np.empty((b, l_max), dtype=np.int32)
    lens = np.empty(b, dtype=np.int32)
    trunc = np.empty(b, dtype=np.uint8)
    rc = lib.gtok_zinc_encode(
        _i32p(atoms), _i64p(node_off), _i32p(src), _i32p(dst), _i32p(bond),
        _i64p(edge_off), b, _i32p(atom_ids), _i32p(bond_ids), _i32p(index_ids),
        _i32p(tail_ids), max_len, pad, vocab["<bos>"], l_max,
        _i32p(out), _i32p(lens), trunc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"gtok_zinc_encode failed: {rc}")
    true_max = int(lens.max()) if b else 0
    return out[:, :true_max], lens, trunc.astype(bool)


def pack_ids_native(ids: np.ndarray, lens: np.ndarray, l_bucket: int,
                    pad_id: int) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel corpus pack (semantics of tokenization.pack.pack_corpus):
    returns (out int32 [n, l_bucket], mask bool [n, l_bucket])."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n, l = ids.shape
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    out = np.empty((n, l_bucket), dtype=np.int32)
    mask = np.empty((n, l_bucket), dtype=np.uint8)
    lib.gtok_pack_ids(_i32p(ids), _i32p(lens32), n, l, l_bucket, pad_id,
                      _i32p(out), mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, mask.view(bool)


def sent_tokenize_batch_native(
    graphs,
    idx_offset: int,
    trunc_len: int,
    labeled: bool = False,
    node_idx_offset: int = 0,
    edge_idx_offset: int = 0,
    pad_id: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native batched SENT tokenization; semantics of TrailTokenizer.__call__."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b = len(graphs)
    # a GraphCorpus carries its flat struct-of-arrays form — reuse it
    # (spot-checked) instead of re-concatenating per-graph arrays
    flat = getattr(graphs, "flat", None)
    if flat is not None:
        from ..tokenization.ibtt_fast import _corpus_flat_matches
        if not _corpus_flat_matches(flat, graphs):
            flat = None
    if flat is not None:
        edge_off = _flat_as(flat, "edge_off", np.int64)
        node_off = _flat_as(flat, "node_off", np.int64)
        src = _flat_as(flat, "src", np.int32)
        dst = _flat_as(flat, "dst", np.int32)
        elab = _flat_as(flat, "bond", np.int32)
        num_nodes = _flat_as(flat, "n_nodes", np.int32)
        nlab = _flat_as(flat, "atoms", np.int32) if labeled else np.zeros(0, np.int32)
    else:
        n_edges = np.asarray([g.edges.shape[0] for g in graphs], dtype=np.int64)
        edge_off = np.zeros(b + 1, dtype=np.int64)
        np.cumsum(n_edges, out=edge_off[1:])
        if edge_off[-1]:
            src = np.ascontiguousarray(
                np.concatenate([g.edges[:, 0] for g in graphs]).astype(np.int32))
            dst = np.ascontiguousarray(
                np.concatenate([g.edges[:, 1] for g in graphs]).astype(np.int32))
            elab = np.ascontiguousarray(np.concatenate([
                g.edge_labels if g.edge_labels is not None
                else np.ones(g.edges.shape[0], np.int32) for g in graphs]).astype(np.int32))
        else:
            src = dst = elab = np.zeros(0, dtype=np.int32)
        num_nodes = np.asarray([g.num_nodes for g in graphs], dtype=np.int32)
        node_off = np.zeros(b + 1, dtype=np.int64)
        np.cumsum(num_nodes.astype(np.int64), out=node_off[1:])
        if labeled:
            nlab = np.ascontiguousarray(
                np.concatenate([g.node_labels for g in graphs]).astype(np.int32))
        else:
            nlab = np.zeros(0, dtype=np.int32)
    out = np.empty((b, trunc_len), dtype=np.int32)
    lens = np.empty(b, dtype=np.int32)
    rc = lib.gtok_sent_tokenize_batch(
        _i32p(src), _i32p(dst), _i32p(elab), _i64p(edge_off), _i32p(num_nodes),
        _i32p(nlab), _i64p(node_off), b, int(labeled), idx_offset,
        node_idx_offset, edge_idx_offset, trunc_len, pad_id, _i32p(out),
        _i32p(lens))
    if rc != 0:
        raise RuntimeError(f"gtok_sent_tokenize_batch failed: {rc}")
    return out, lens


_CORPUS_TASK_KINDS = {"cycle_check": 0, "shortest_path": 1}


def scan_corpus_file(path: str, task: str):
    """Native scan of one strict-layout graph-token corpus JSON file
    (native/gtok.cpp gtok_corpus_scan).

    Returns ``(buf, offs, lens, labels, has_q, qu, qv)`` — text i is
    ``buf[offs[i]:offs[i]+lens[i]]`` (ASCII, decode lazily), ``labels``
    uses -2 for Python None, ``qu``/``qv`` are meaningful where
    ``has_q`` is 1 — or ``None`` when the library is unavailable, the
    task is not one of the two reference tasks, or the file deviates from
    the strict layout (the caller must fall back to the Python reader in
    either case).
    """
    kind = _CORPUS_TASK_KINDS.get(task)
    lib = get_lib()
    if kind is None or lib is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    n = ctypes.c_int64(0)
    handle = lib.gtok_corpus_scan(buf, len(buf), kind, ctypes.byref(n))
    if not handle:
        return None
    try:
        count = n.value
        offs = np.empty(count, dtype=np.int64)
        lens = np.empty(count, dtype=np.int64)
        labels = np.empty(count, dtype=np.int32)
        has_q = np.empty(count, dtype=np.int32)
        qu = np.empty(count, dtype=np.int32)
        qv = np.empty(count, dtype=np.int32)
        if count:
            lib.gtok_corpus_fill(handle, _i64p(offs), _i64p(lens),
                                 _i32p(labels), _i32p(has_q), _i32p(qu),
                                 _i32p(qv))
    finally:
        lib.gtok_corpus_free(handle)
    return buf, offs, lens, labels, has_q, qu, qv
