"""Content-addressed dataset cache: second build loads identical arrays;
config changes miss the cache."""

import tempfile

import numpy as np

from glearning_benchmark_tpu.train.datasets import _cache_path
from glearning_benchmark_tpu.train.trainer import build_dataset


def _cfg(root, **extra):
    d = {"graph_token_root": root, "task": "cycle_check",
         "train_algorithms": ["ba"], "test_algorithm": "sfn",
         "use_split_tasks_dirs": True, "num_graphs": 15,
         "max_len": 600, "max_vocab": 600, "generate_num_graphs": 15}
    d.update(extra)
    return d


def test_cache_roundtrip():
    root = tempfile.mkdtemp()
    cfg = _cfg(root)
    b1 = build_dataset("ibtt", cfg, seed=0)
    b2 = build_dataset("ibtt", cfg, seed=0)  # cache hit
    assert b1.vocab == b2.vocab
    for s in ("train", "val", "test"):
        for k in b1.splits[s]:
            np.testing.assert_array_equal(b1.splits[s][k], b2.splits[s][k])
    assert b1.num_classes == b2.num_classes
    assert b1.meta == b2.meta


def test_cache_key_sensitivity():
    root = tempfile.mkdtemp()
    p1 = _cache_path("ibtt", _cfg(root), 0, None)
    p2 = _cache_path("ibtt", _cfg(root, num_graphs=10), 0, None)
    p3 = _cache_path("agtt", _cfg(root), 0, None)
    p4 = _cache_path("ibtt", _cfg(root), 1, None)
    assert len({p1, p2, p3, p4}) == 4


def test_cache_key_versions_zinc_standin(monkeypatch):
    """Bumping ZINC_STANDIN_VERSION must change the cache key (r5: the
    target redesign silently trained on r4-labeled cache hits because the
    zinc stand-in had no version in the key)."""
    import glearning_benchmark_tpu.data.zinc as zmod
    cfg = {"zinc_root": tempfile.mkdtemp(), "task": "zinc",
           "max_len": 128, "max_vocab": 600}
    p1 = _cache_path("ibtt", cfg, 0, None)
    monkeypatch.setattr(zmod, "ZINC_STANDIN_VERSION",
                        zmod.ZINC_STANDIN_VERSION + 1)
    p2 = _cache_path("ibtt", cfg, 0, None)
    assert p1 != p2


def test_cache_disabled():
    root = tempfile.mkdtemp()
    cfg = _cfg(root, cache=False)
    assert _cache_path("ibtt", cfg, 0, None) is not None  # path exists
    b = build_dataset("ibtt", cfg, seed=0)
    import os
    assert not os.path.isdir(os.path.join(root, "processed")) or \
        not any("ibtt" in d for d in os.listdir(os.path.join(root, "processed")))
    assert b.n("train") > 0


def test_cache_graph_dataset():
    root = tempfile.mkdtemp()
    cfg = _cfg(root)
    b1 = build_dataset("mpnn", cfg, seed=0)
    b2 = build_dataset("mpnn", cfg, seed=0)
    np.testing.assert_array_equal(b1.splits["train"]["adj"], b2.splits["train"]["adj"])
    assert b2.splits["train"]["adj"].dtype == np.uint8
