"""Padding / packing of token-id sequences into fixed-shape batches.

The reference right-pads each DataLoader batch to the batch max with a
boolean attention mask (reference: data_loader.py:488-497,
train_agtt.py:276-302). On TPU, per-batch max lengths cause one XLA
recompile per distinct length, so the default here is corpus-level packing:
tokenize once into a single [N, L] matrix padded to a fixed bucket length,
then every batch has an identical static shape.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def pad_sequences(
    seqs: Sequence[np.ndarray],
    pad_id: int,
    max_len: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Right-pad variable-length id sequences. Returns (ids [B, L], mask [B, L])."""
    b = len(seqs)
    lens = [min(len(s), max_len) if max_len else len(s) for s in seqs]
    l = max(lens, default=0)
    ids = np.full((b, l), pad_id, dtype=np.int32)
    mask = np.zeros((b, l), dtype=bool)
    for i, s in enumerate(seqs):
        k = lens[i]
        ids[i, :k] = s[:k]
        mask[i, :k] = True
    return ids, mask


def round_up_to_bucket(n: int, buckets: Sequence[int] = (64, 128, 256, 512, 640, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def pack_corpus(
    ids: np.ndarray,
    lengths: np.ndarray,
    pad_id: int,
    bucket: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a ragged-ish [N, L] matrix out to a static bucket length.

    Returns (ids [N, L_bucket], mask [N, L_bucket]). One static shape for
    the whole corpus -> one XLA compile for the whole training run.
    """
    n, l = ids.shape
    lb = round_up_to_bucket(l) if bucket else l
    out = np.full((n, lb), pad_id, dtype=np.int32)
    out[:, :l] = ids
    mask = np.arange(lb)[None, :] < lengths[:, None]
    return out, mask


def batch_iterator(
    n: int,
    batch_size: int,
    shuffle: bool,
    seed: int,
    drop_remainder: bool = False,
):
    """Yield index arrays; the final short batch is padded by repeating index
    0 with a validity count so jitted steps keep a static batch shape."""
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(idx)
    for start in range(0, n, batch_size):
        chunk = idx[start : start + batch_size]
        valid = len(chunk)
        if valid < batch_size:
            if drop_remainder:
                return
            chunk = np.concatenate([chunk, np.zeros(batch_size - valid, dtype=chunk.dtype)])
        yield chunk, valid
