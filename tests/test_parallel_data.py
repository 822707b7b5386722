"""Host-sharding helpers: contiguity, coverage, vocab identity across a
simulated multi-host split."""

from glearning_benchmark_tpu.parallel import (
    distributed_vocab_counts,
    host_shard_bounds,
    make_mesh,
    shard_for_host,
)
from glearning_benchmark_tpu.tokenization import build_vocab_from_texts


def test_bounds_cover_and_disjoint():
    n, pc = 103, 8
    spans = [host_shard_bounds(n, pi, pc) for pi in range(pc)]
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # contiguous, disjoint
    sizes = [e - s for s, e in spans]
    assert max(sizes) - min(sizes) <= 1


def test_shard_for_host_roundtrip():
    items = list(range(50))
    got = []
    for pi in range(4):
        got.extend(shard_for_host(items, pi, 4))
    assert got == items


def test_sharded_vocab_identical_to_host_build():
    """End-to-end: contiguous host shards -> distributed psum vocab ==
    single-host vocab, byte-for-byte (the north-star invariant)."""
    texts = [f"n{i % 13} e{i % 7} <e> <q> has_cycle <p> {'yes' if i % 3 else 'no'}"
             for i in range(64)]
    mesh = make_mesh()
    d = mesh.shape["data"]
    shards = [shard_for_host(texts, pi, d) for pi in range(d)]
    v_dist, _ = distributed_vocab_counts(shards, mesh)
    v_host, _ = build_vocab_from_texts(texts)
    assert v_dist == v_host
