"""Stable (process-invariant) hashing.

The reference derives per-algorithm sampling seeds via ``seed + hash(algo) % 10000``
(reference: graph_data_loader/data_loader.py:627), but Python's ``hash(str)`` is
randomized per process unless PYTHONHASHSEED is pinned — a latent nondeterminism.
We replace it with a stable 64-bit hash so corpora are reproducible across
processes and hosts (required for the multi-host data-parallel sharding story).
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_hash(s: str, bits: int = 64) -> int:
    """Deterministic non-negative integer hash of a string (blake2b-based)."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
    v = int.from_bytes(h, "little")
    return v & ((1 << bits) - 1)


def stable_token_hash(tokens: list[str]) -> np.ndarray:
    """Vectorizable stable uint64 hash of many tokens (for jnp histogramming)."""
    return np.array([stable_hash(t) for t in tokens], dtype=np.uint64)
