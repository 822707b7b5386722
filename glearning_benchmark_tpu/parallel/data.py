"""Multi-host data sharding.

BASELINE north star: corpus sharded data-parallel across hosts, vocab
replicated, counts psum-reduced. The reference loads everything on one
process. Here each host deterministically takes a *contiguous* slice of the
(stable-ordered) corpus — contiguity is what makes the distributed vocab
build id-identical to the host build (parallel/dist.py).
"""

from __future__ import annotations

from typing import Sequence, TypeVar

import jax

T = TypeVar("T")


def host_shard_bounds(n: int, process_index: int | None = None,
                      process_count: int | None = None) -> tuple[int, int]:
    """[start, end) of this host's contiguous corpus slice. Remainder items
    go to the leading hosts, keeping sizes within one of each other."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n, pc)
    start = pi * base + min(pi, rem)
    end = start + base + (1 if pi < rem else 0)
    return start, end


def shard_for_host(items: Sequence[T], process_index: int | None = None,
                   process_count: int | None = None) -> Sequence[T]:
    start, end = host_shard_bounds(len(items), process_index, process_count)
    return items[start:end]


def initialize_distributed() -> None:
    """Initialize jax.distributed from cluster env vars when present
    (multi-host pod slices); single-process otherwise."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except Exception:
            pass
