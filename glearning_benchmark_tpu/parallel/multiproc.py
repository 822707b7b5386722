"""True multi-process (multi-host) vocab build over corpus shards.

parallel/dist.py's ``distributed_vocab_counts`` assumes one process holding
every shard (virtual-mesh testing). This module is the N-process version:
each process holds ONLY its contiguous corpus shard (parallel/data.py
ordering), candidate tokens are all-gathered in process-major order (which
equals global first-occurrence order because shards are contiguous), counts
are reduced with an XLA all-reduce across processes, and every process
derives the identical id table — the BASELINE.json north-star layout
(corpus sharded data-parallel across hosts, vocab replicated, counts
psum-reduced). The reference builds its vocab with a single-process Counter
(data_loader.py:451-463).

Requires jax.distributed.initialize() to have been called (or a
single-process default, where this degrades to the host build).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..tokenization.vocab import SPECIAL


def _allgather_bytes(payload: bytes) -> List[bytes]:
    """All-gather one variable-length byte string per process (padded XLA
    all-gathers under the hood)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return [payload]
    n = np.frombuffer(payload, dtype=np.uint8)
    lens = multihost_utils.process_allgather(np.asarray([n.size], np.int64))
    lens = np.asarray(lens).reshape(-1)
    max_len = int(lens.max())
    buf = np.zeros(max_len, dtype=np.uint8)
    buf[: n.size] = n
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [gathered[i, : int(lens[i])].tobytes()
            for i in range(jax.process_count())]


def allgather_candidate_tokens(shard_texts: Sequence[str]) -> List[str]:
    """Global candidate-token table in global first-occurrence order.

    Each process contributes its shard's unique tokens in local
    first-occurrence order; process-major concatenation + dedup equals the
    global scan order for contiguous shards."""
    local: Dict[str, None] = {}
    for text in shard_texts:
        for tok in text.split():
            local.setdefault(tok, None)
    payload = "\n".join(local).encode("utf-8")
    merged: Dict[str, None] = {}
    for chunk in _allgather_bytes(payload):
        if not chunk:
            continue
        for tok in chunk.decode("utf-8").split("\n"):
            merged.setdefault(tok, None)
    return list(merged)


def allreduce_counts(local_counts: np.ndarray) -> np.ndarray:
    """Sum an int64 count vector across processes (XLA all-gather+sum)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return local_counts
    stacked = np.asarray(multihost_utils.process_allgather(
        local_counts.astype(np.int64)))
    return stacked.reshape(jax.process_count(), -1).sum(axis=0)


def multiprocess_zinc_vocab(mols_shard, flat=None) -> Dict[str, int]:
    """Distributed ZINC vocab: fixed 22-id block + dynamic tokens in GLOBAL
    first-occurrence order, each process holding one contiguous molecule
    shard. Local discovery runs the numeric fast path
    (tokenization/ibtt_fast.build_zinc_vocab_fast); the per-shard dynamic
    lists are all-gathered process-major and deduped — which equals the
    global corpus-scan order for contiguous shards. Id-identical to the
    single-process build (reference semantics: train_ibtt.py:363-372 +
    zinc_vocab.py:154-179)."""
    from ..tokenization.ibtt_fast import build_zinc_vocab_fast
    from ..tokenization.vocab import (
        build_fixed_zinc_vocab,
        extend_vocab_with_dynamic_tokens,
    )

    fixed, _ = build_fixed_zinc_vocab()
    local_vocab = build_zinc_vocab_fast(mols_shard, flat=flat)
    dyn_local = [t for t, i in sorted(local_vocab.items(), key=lambda kv: kv[1])
                 if t not in fixed]
    merged: Dict[str, None] = {}
    for chunk in _allgather_bytes("\n".join(dyn_local).encode("utf-8")):
        if chunk:
            for tok in chunk.decode("utf-8").split("\n"):
                merged.setdefault(tok, None)
    return extend_vocab_with_dynamic_tokens(fixed, merged)


def multiprocess_vocab_build(
    shard_texts: Sequence[str],
    max_tokens: int | None = None,
    min_freq: int = 1,
) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Build the vocab across N processes; id-identical to
    ``build_vocab_from_texts`` on the concatenated global corpus (tested in
    tests/test_multiproc.py). Deterministic ranking: count desc, global
    first-occurrence tie-break — the same contract as parallel/dist.py."""
    slots = allgather_candidate_tokens(shard_texts)
    slot_of = {tok: i for i, tok in enumerate(slots)}
    local = np.zeros(len(slots), dtype=np.int64)
    for text in shard_texts:
        for tok in text.split():
            local[slot_of[tok]] += 1
    total = allreduce_counts(local)

    order = sorted(range(len(slots)), key=lambda i: (-int(total[i]), i))
    vocab = {tok: i for i, tok in enumerate(SPECIAL)}
    idx = len(vocab)
    for i in order:
        tok = slots[i]
        if tok in vocab:
            continue
        if int(total[i]) < min_freq:
            break
        vocab[tok] = idx
        idx += 1
        if max_tokens and idx >= max_tokens:
            break
    return vocab, {i: t for t, i in vocab.items()}
