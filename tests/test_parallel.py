"""Multi-device tests on the 8-device virtual CPU mesh: distributed vocab
construction, metric psum, sharded train step (the dryrun path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glearning_benchmark_tpu.parallel import (
    all_reduce_metrics,
    distributed_vocab_counts,
    make_mesh,
)
from glearning_benchmark_tpu.tokenization import build_vocab_from_texts


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_distributed_vocab_matches_local(mesh):
    texts = [f"a b tok{i % 11} <e> <q> has_cycle <p> {'yes' if i % 2 else 'no'}"
             for i in range(64)]
    shards = [texts[i * 8:(i + 1) * 8] for i in range(8)]  # contiguous
    v_dist, itos = distributed_vocab_counts(shards, mesh)
    v_local, _ = build_vocab_from_texts(texts)
    assert v_dist == v_local
    assert itos[0] == "<pad>"


def test_distributed_vocab_min_freq_and_cap(mesh):
    texts = ["common common rare"] * 8
    shards = [texts[i:i + 1] for i in range(8)]
    v, _ = distributed_vocab_counts(shards, mesh, max_tokens=11)
    assert len(v) <= 11


def test_all_reduce_metrics(mesh):
    stats = {"loss_sum": jnp.arange(8.0), "cm": jnp.ones((8, 2, 2))}
    out = all_reduce_metrics(stats, mesh)
    # psum over data axis: every shard's stat summed
    np.testing.assert_allclose(np.asarray(out["loss_sum"])[0], 28.0)
    np.testing.assert_allclose(np.asarray(out["cm"])[0], 8 * np.ones((2, 2)))


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 2
