"""Sequence-parallel ring attention (ops/ring_attention.py).

Validates the shard_map ring against the XLA reference attention on the
virtual 8-device CPU mesh (conftest forces the platform): forward parity,
gradient parity through ppermute+scan, dropout semantics, the transformer
integration (sp_mesh), and the layout guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from glearning_benchmark_tpu.ops.attention import multi_head_attention
from glearning_benchmark_tpu.ops.ring_attention import ring_attention


def _mesh(dp, sp):
    return Mesh(np.array(jax.devices()[: dp * sp]).reshape(dp, sp),
                ("data", "seq"))


def _qkvm(b=4, l=64, h=4, d=16, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
    if ragged:
        lens = rng.integers(1, l + 1, size=b)
        lens[0] = l          # one full row
        lens[-1] = 3         # one row shorter than a single shard block
    else:
        lens = np.full(b, l)
    mask = jnp.asarray(np.arange(l)[None] < lens[:, None])
    return q, k, v, mask


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (1, 8)])
def test_forward_matches_xla(dp, sp):
    mesh = _mesh(dp, sp)
    q, k, v, mask = _qkvm(b=4 if dp <= 4 else dp)
    ref = multi_head_attention(q, k, v, key_mask=mask)
    out = jax.jit(lambda *a: ring_attention(mesh, *a))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_gradients_match_xla():
    mesh = _mesh(2, 4)
    q, k, v, mask = _qkvm(seed=1)

    def loss_ref(q, k, v):
        return (multi_head_attention(q, k, v, key_mask=mask) ** 2).sum()

    def loss_ring(q, k, v):
        return (ring_attention(mesh, q, k, v, mask) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-5)


def test_fully_masked_row_outputs_zero():
    mesh = _mesh(2, 4)
    q, k, v, mask = _qkvm(seed=2, ragged=False)
    mask = mask.at[1].set(False)
    out = jax.jit(lambda *a: ring_attention(mesh, *a))(q, k, v, mask)
    assert np.all(np.asarray(out)[1] == 0.0)
    ref = multi_head_attention(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0],
                               atol=2e-6, rtol=2e-6)


def test_dropout_semantics():
    mesh = _mesh(2, 4)
    q, k, v, mask = _qkvm(seed=3, ragged=False)
    key = jax.random.PRNGKey(7)
    f = jax.jit(lambda *a: ring_attention(mesh, *a, dropout_rate=0.25,
                                          dropout_rng=key))
    o1, o2 = f(q, k, v, mask), f(q, k, v, mask)
    # same key -> identical mask; different from the undropped output
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    base = jax.jit(lambda *a: ring_attention(mesh, *a))(q, k, v, mask)
    assert not np.allclose(np.asarray(o1), np.asarray(base))
    # inverted-scaling keeps the expectation close to the undropped output
    assert abs(float(o1.mean()) - float(base.mean())) < 0.05


def test_length_must_divide_seq_axis():
    mesh = _mesh(2, 4)
    q, k, v, mask = _qkvm(l=62)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(mesh, q, k, v, mask)


def test_transformer_sp_matches_single_device():
    """SimpleTransformer(sp_mesh=...) computes the same logits as the plain
    XLA-attention model with identical parameters."""
    from glearning_benchmark_tpu.models.transformer import SimpleTransformer

    mesh = _mesh(2, 4)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 100, size=(4, 64)).astype(np.int32)
    ids[:, 0] = 1
    mask = np.ones((4, 64), dtype=bool)
    kw = dict(vocab_size=100, d_model=16, nhead=4, nlayers=2, d_ff=32,
              p_drop=0.0, max_pos=64, num_classes=2, use_query_nodes=False)
    base = SimpleTransformer(**kw)
    sp = SimpleTransformer(**kw, sp_mesh=mesh)
    params = base.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                       jnp.asarray(mask), deterministic=True)["params"]
    out_base = base.apply({"params": params}, jnp.asarray(ids),
                          jnp.asarray(mask), deterministic=True)
    out_sp = jax.jit(lambda p, i, m: sp.apply({"params": p}, i, m,
                                              deterministic=True))(
        params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_base),
                               atol=2e-5, rtol=2e-5)


def test_packed_rows_rejected():
    from glearning_benchmark_tpu.models.transformer import SimpleTransformer

    mesh = _mesh(2, 4)
    ids = jnp.ones((2, 64), jnp.int32)
    mask = jnp.ones((2, 64), bool)
    seg = jnp.ones((2, 64), jnp.int32)
    pos = jnp.zeros((2, 64), jnp.int32)
    slots = jnp.zeros((2, 4), jnp.int32)
    model = SimpleTransformer(vocab_size=10, d_model=16, nhead=4, nlayers=1,
                              d_ff=32, p_drop=0.0, max_pos=64, num_classes=2,
                              use_query_nodes=False, sp_mesh=mesh)
    with pytest.raises(ValueError, match="packed"):
        model.init(jax.random.PRNGKey(0), ids, mask, deterministic=True,
                   seg=seg, pos=pos, pos_bos=slots, pos_u=slots, pos_v=slots)
