"""Distributed reductions: vocab-count histograms and metric aggregation.

BASELINE.json north star: the corpus is sharded data-parallel across hosts,
the vocab/merge table replicated, and token/symbol frequency counts reduced
via psum/all-reduce. The reference builds its vocab with a host-local
``Counter`` (data_loader.py:451-463) — correct single-process only. Here
each shard computes a local count vector over a shared candidate-token
table and the counts are psum-reduced over the 'data' mesh axis; ranking is
then deterministic (count desc, first-occurrence tie-break), so every host
derives the identical id table.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..tokenization.vocab import SPECIAL


def psum_histogram(local_counts: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """All-reduce a count vector over the 'data' axis of ``mesh``."""

    @partial(jax.shard_map, mesh=mesh, in_specs=P("data", None),
             out_specs=P(None, None), check_vma=False)
    def _reduce(x):
        return jax.lax.psum(x, axis_name="data")

    return _reduce(local_counts).sum(axis=0)


def _local_counts(shard_texts: Sequence[str], token_to_slot: Dict[str, int],
                  num_slots: int) -> np.ndarray:
    counts = np.zeros(num_slots, dtype=np.int64)
    for text in shard_texts:
        for tok in text.split():
            slot = token_to_slot.get(tok)
            if slot is not None:
                counts[slot] += 1
    return counts


def distributed_vocab_counts(
    shard_texts_per_device: List[Sequence[str]],
    mesh: Mesh,
    max_tokens: int | None = None,
    min_freq: int = 1,
) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Build the vocab from per-device corpus shards with a psum reduction.

    Candidate discovery: each shard's unique tokens, merged in shard-major
    first-occurrence order. Counting then runs as one [D, S] -> psum -> [S]
    reduction on device. Shards MUST be contiguous partitions of the corpus
    in its global order — then shard-major first-occurrence equals global
    first-occurrence and the resulting table is id-identical to
    ``build_vocab_from_texts`` on the concatenated corpus (tested).
    """
    # deterministic candidate table (host-side union, first-occurrence order)
    token_to_slot: Dict[str, int] = {}
    for shard in shard_texts_per_device:
        for text in shard:
            for tok in text.split():
                if tok not in token_to_slot:
                    token_to_slot[tok] = len(token_to_slot)
    slots = list(token_to_slot)
    num_slots = len(slots)

    d = mesh.shape["data"]
    assert len(shard_texts_per_device) == d, "one text shard per data-axis slice"
    local = np.stack([
        _local_counts(shard, token_to_slot, num_slots)
        for shard in shard_texts_per_device
    ])
    total = np.asarray(psum_histogram(jnp.asarray(local), mesh))

    # deterministic ranking: count desc, then global first-occurrence
    order = sorted(range(num_slots), key=lambda i: (-int(total[i]), i))
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
    itos = {i: t for t, i in vocab.items()}
    return vocab, itos


def all_reduce_metrics(stats: dict, mesh: Mesh) -> dict:
    """psum a pytree of metric sufficient statistics over 'data'."""
    leaves, treedef = jax.tree.flatten(stats)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=tuple(P("data") for _ in leaves),
             out_specs=tuple(P() for _ in leaves), check_vma=False)
    def _reduce(*xs):
        return tuple(jax.lax.psum(x, axis_name="data") for x in xs)

    return jax.tree.unflatten(treedef, _reduce(*leaves))
