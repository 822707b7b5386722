"""Model unit tests: shapes, masking invariance, query readout, GIN
permutation invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glearning_benchmark_tpu.models import GPSModel, MPNN, SimpleTransformer


def test_transformer_shapes_and_mask_invariance():
    model = SimpleTransformer(vocab_size=50, d_model=16, nhead=4, nlayers=2,
                              d_ff=32, max_pos=64, num_classes=2,
                              use_query_nodes=False)
    ids = np.zeros((3, 10), dtype=np.int32)
    ids[:, 0] = 1  # <bos>
    ids[:, 1:5] = 7
    mask = np.zeros((3, 10), dtype=bool)
    mask[:, :5] = True
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out = model.apply({"params": params}, ids, mask)
    assert out.shape == (3, 2)
    # changing PADDED positions must not change the output
    ids2 = ids.copy()
    ids2[:, 5:] = 33
    out2 = model.apply({"params": params}, ids2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_transformer_query_readout():
    """Query readout must pick hidden states at q_pos + offsets; moving the
    query pair changes the output, other-position noise does not."""
    q_id = 4
    model = SimpleTransformer(vocab_size=50, d_model=16, nhead=4, nlayers=1,
                              d_ff=32, max_pos=64, num_classes=7,
                              use_query_nodes=True, query_offsets=(2, 3))
    ids = np.ones((2, 12), dtype=np.int32)
    ids[0, 6] = q_id; ids[0, 8] = 9; ids[0, 9] = 10
    ids[1, 6] = q_id; ids[1, 8] = 11; ids[1, 9] = 12
    mask = np.ones((2, 12), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask, q_token_id=q_id)["params"]
    out = model.apply({"params": params}, ids, mask, q_token_id=q_id)
    assert out.shape == (2, 7)
    # rows with different query-node tokens produce different logits
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # absent '<q>' -> zero query embeddings (fallback), still finite
    ids_noq = np.ones((2, 12), dtype=np.int32)
    out3 = model.apply({"params": params}, ids_noq, mask, q_token_id=q_id)
    assert np.isfinite(np.asarray(out3)).all()


def test_transformer_zinc_regression_shape():
    model = SimpleTransformer(vocab_size=30, d_model=16, nhead=2, nlayers=1,
                              d_ff=32, max_pos=32, num_classes=1,
                              use_query_nodes=False, task="zinc")
    ids = np.ones((4, 8), dtype=np.int32)
    mask = np.ones((4, 8), dtype=bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out = model.apply({"params": params}, ids, mask)
    assert out.shape == (4,)


def _random_graph_batch(rng, b=3, n=8, f=1):
    adj = np.zeros((b, n, n), np.float32)
    for i in range(b):
        for _ in range(10):
            u, v = rng.integers(0, n, 2)
            if u != v:
                adj[i, u, v] = adj[i, v, u] = 1.0
    feat = np.ones((b, n, f), np.float32)
    mask = np.ones((b, n), bool)
    return feat, adj, mask


def test_mpnn_shapes_and_perm_invariance():
    rng = np.random.default_rng(0)
    feat, adj, mask = _random_graph_batch(rng)
    model = MPNN(in_dim=1, hidden_dim=16, num_layers=2, pooling="mean",
                 num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), feat, adj, mask)
    out = model.apply(variables, feat, adj, mask)
    assert out.shape == (3, 2)
    # node relabeling must not change graph-level output (constant features)
    perm = rng.permutation(adj.shape[1])
    adj_p = adj[:, perm][:, :, perm]
    out_p = model.apply(variables, feat, adj_p, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), atol=1e-4)


def test_mpnn_padding_invariance():
    rng = np.random.default_rng(1)
    feat, adj, mask = _random_graph_batch(rng, b=2, n=6)
    model = MPNN(in_dim=1, hidden_dim=16, num_layers=2, pooling="mean", num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), feat, adj, mask)
    out = model.apply(variables, feat, adj, mask)
    # pad out to n=10 with garbage in masked region
    feat2 = np.concatenate([feat, 7 * np.ones((2, 4, 1), np.float32)], axis=1)
    adj2 = np.zeros((2, 10, 10), np.float32)
    adj2[:, :6, :6] = adj
    mask2 = np.concatenate([mask, np.zeros((2, 4), bool)], axis=1)
    out2 = model.apply(variables, feat2, adj2, mask2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_mpnn_batch_stats_update():
    rng = np.random.default_rng(2)
    feat, adj, mask = _random_graph_batch(rng)
    model = MPNN(in_dim=1, hidden_dim=8, num_layers=1, num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), feat, adj, mask)
    out, updates = model.apply(variables, feat, adj, mask, deterministic=False,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in updates
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gps_shapes():
    rng = np.random.default_rng(3)
    feat, adj, mask = _random_graph_batch(rng, f=3)
    model = GPSModel(in_dim=3, dim=16, num_layers=2, n_heads=4, num_classes=7)
    variables = model.init(jax.random.PRNGKey(0), feat, adj, mask)
    out = model.apply(variables, feat, adj, mask)
    assert out.shape == (3, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_gps_zinc_regression():
    rng = np.random.default_rng(4)
    feat, adj, mask = _random_graph_batch(rng)
    model = GPSModel(in_dim=1, dim=16, num_layers=1, n_heads=2, num_classes=1,
                     task="zinc")
    variables = model.init(jax.random.PRNGKey(0), feat, adj, mask)
    out = model.apply(variables, feat, adj, mask)
    assert out.shape == (3,)
