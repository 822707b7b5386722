#!/usr/bin/env python
"""GCN vs GAT on node classification — script twin of the reference's
second notebook (reference notebooks/gcn_gat.ipynb: 2-layer GCNConv vs
GATConv on Cora with training curves and a comparison summary).

No dataset download is possible here, so the Cora stand-in is a seeded
4-community stochastic block model "citation network" with bag-of-words
style features (noisy community prototypes) and a Cora-style split (20
labeled nodes per class for training). Both models are TPU-idiomatic:
dense normalized-adjacency matmuls for GCN and dense masked multi-head
attention for GAT — single [N,N] matmuls on the MXU instead of PyG's
scatter/gather kernels.

    python examples/gcn_vs_gat.py [--figures out_dir] [--epochs 300]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Synthetic citation network (Cora stand-in)
# ---------------------------------------------------------------------------

def make_citation_sbm(num_nodes=400, num_classes=4, feat_dim=64, seed=0):
    """4-block SBM + noisy prototype features, Cora-style node split."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=num_nodes)
    p_in, p_out = 0.035, 0.008
    iu, iv = np.triu_indices(num_nodes, k=1)
    prob = np.where(labels[iu] == labels[iv], p_in, p_out)
    keep = rng.random(iu.shape[0]) < prob
    edges = np.stack([iu[keep], iv[keep]], axis=1)

    # bag-of-words analogue: each class has a sparse binary prototype; a
    # node samples its prototype's words unreliably, over heavy background
    # noise — features alone are weakly informative, like Cora, so the
    # graph structure carries most of the signal
    protos = rng.random((num_classes, feat_dim)) < 0.2
    x = np.zeros((num_nodes, feat_dim), np.float32)
    for i in range(num_nodes):
        on = protos[labels[i]] & (rng.random(feat_dim) < 0.35)
        noise = rng.random(feat_dim) < 0.12
        x[i] = (on | noise).astype(np.float32)

    # Cora-style split: 20 train nodes per class, 100 val, rest test
    train_mask = np.zeros(num_nodes, bool)
    for c in range(num_classes):
        idx = np.flatnonzero(labels == c)
        train_mask[rng.choice(idx, size=min(20, len(idx)), replace=False)] = True
    rest = np.flatnonzero(~train_mask)
    rng.shuffle(rest)
    val_mask = np.zeros(num_nodes, bool)
    val_mask[rest[:100]] = True
    test_mask = np.zeros(num_nodes, bool)
    test_mask[rest[100:]] = True
    return x, edges, labels, train_mask, val_mask, test_mask


# ---------------------------------------------------------------------------
# Models (flax) — dense, single-graph, full-batch like the notebook
# ---------------------------------------------------------------------------

def build_models(feat_dim, num_classes, hidden=16, heads=8):
    import jax.numpy as jnp
    from flax import linen as nn

    class GCN(nn.Module):
        """h' = ReLU(Â h W); Â = D^-1/2 (A+I) D^-1/2 precomputed dense.
        Two layers, dropout 0.5 — the notebook's GCNConv stack."""

        @nn.compact
        def __call__(self, x, a_norm, train: bool):
            x = nn.Dropout(0.5, deterministic=not train)(x)
            x = nn.relu(a_norm @ nn.Dense(hidden, use_bias=False)(x))
            x = nn.Dropout(0.5, deterministic=not train)(x)
            return a_norm @ nn.Dense(num_classes, use_bias=False)(x)

    class GATLayer(nn.Module):
        """Dense masked attention: e_ij = LeakyReLU(a_l.Wh_i + a_r.Wh_j),
        softmax over the (self-loop-augmented) neighborhood. One [N,N]
        score matrix per head — all heads in one einsum on the MXU."""

        out_dim: int
        n_heads: int
        concat: bool = True

        @nn.compact
        def __call__(self, x, adj_mask, train: bool):
            h = nn.DenseGeneral((self.n_heads, self.out_dim), use_bias=False)(x)
            a_l = self.param("a_l", nn.initializers.glorot_uniform(),
                             (self.n_heads, self.out_dim))
            a_r = self.param("a_r", nn.initializers.glorot_uniform(),
                             (self.n_heads, self.out_dim))
            # scores[h,i,j] = leaky(left[i,h] + right[j,h])
            left = jnp.einsum("nhd,hd->nh", h, a_l)
            right = jnp.einsum("nhd,hd->nh", h, a_r)
            scores = nn.leaky_relu(left.T[:, :, None] + right.T[:, None, :],
                                   negative_slope=0.2)          # [H,N,N]
            scores = jnp.where(adj_mask[None], scores, -1e9)
            attn = nn.softmax(scores, axis=-1)
            attn = nn.Dropout(0.6, deterministic=not train)(attn)
            out = jnp.einsum("hij,jhd->ihd", attn, h)            # [N,H,D]
            if self.concat:
                return out.reshape(out.shape[0], -1)
            return out.mean(axis=1)

    class GAT(nn.Module):
        """notebook GAT: 8-head concat layer + ELU + single-head out."""

        @nn.compact
        def __call__(self, x, adj_mask, train: bool):
            x = nn.Dropout(0.6, deterministic=not train)(x)
            x = nn.elu(GATLayer(out_dim=8, n_heads=heads)(x, adj_mask, train))
            x = nn.Dropout(0.6, deterministic=not train)(x)
            return GATLayer(out_dim=num_classes, n_heads=1,
                            concat=False)(x, adj_mask, train)

    return GCN(), GAT()


# ---------------------------------------------------------------------------
# Training harness (full-batch, jitted)
# ---------------------------------------------------------------------------

def train_model(name, model, graph_arg, x, y, masks, epochs, seed=0, lr=0.01):
    import jax
    import jax.numpy as jnp
    import optax

    train_mask, val_mask, test_mask = (jnp.asarray(m) for m in masks)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    key = jax.random.PRNGKey(seed)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "dropout": key}, x, graph_arg, train=False)
    tx = optax.adamw(lr, weight_decay=5e-4)
    opt_state = tx.init(params)

    def loss_fn(p, rng):
        logits = model.apply(p, x, graph_arg, train=True, rngs={"dropout": rng})
        ll = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.where(train_mask, ll, 0.0).sum() / train_mask.sum()

    @jax.jit
    def step(p, o, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, rng)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def accuracies(p):
        logits = model.apply(p, x, graph_arg, train=False)
        hit = (logits.argmax(-1) == y)
        return tuple(jnp.where(m, hit, False).sum() / m.sum()
                     for m in (train_mask, val_mask, test_mask))

    losses, val_accs = [], []
    best = (-1.0, None)
    t0 = time.time()
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        _, va, _ = accuracies(params)
        losses.append(float(loss))
        val_accs.append(float(va))
        if val_accs[-1] > best[0]:
            best = (val_accs[-1], jax.tree.map(lambda a: a, params))
        if (epoch + 1) % max(1, epochs // 5) == 0:
            print(f"  [{name}] epoch {epoch + 1:4d} loss {losses[-1]:.4f} "
                  f"val acc {val_accs[-1]:.4f}")
    tr, va, te = (float(a) for a in accuracies(best[1]))
    print(f"  [{name}] done in {time.time() - t0:.1f}s — best-val params: "
          f"train {tr:.4f} val {va:.4f} test {te:.4f}")
    return {"losses": losses, "val_accs": val_accs,
            "train": tr, "val": va, "test": te}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--figures", default=None)
    ap.add_argument("--epochs", type=int, default=300)
    args = ap.parse_args()

    import jax.numpy as jnp

    print("=" * 80)
    print("Citation-network stand-in (4-community SBM, Cora-style split)")
    print("=" * 80)
    x, edges, y, train_mask, val_mask, test_mask = make_citation_sbm()
    n = x.shape[0]
    print(f"nodes {n} | edges {len(edges)} | features {x.shape[1]} | "
          f"classes {y.max() + 1}")
    print(f"split: train {train_mask.sum()} / val {val_mask.sum()} / "
          f"test {test_mask.sum()}")

    # dense graph operators (one [N,N] build, reused every epoch)
    a = np.zeros((n, n), np.float32)
    a[edges[:, 0], edges[:, 1]] = 1.0
    a[edges[:, 1], edges[:, 0]] = 1.0
    a_self = a + np.eye(n, dtype=np.float32)
    d_inv_sqrt = 1.0 / np.sqrt(a_self.sum(1))
    a_norm = jnp.asarray(a_self * d_inv_sqrt[:, None] * d_inv_sqrt[None, :])
    adj_mask = jnp.asarray(a_self > 0)

    gcn, gat = build_models(x.shape[1], int(y.max()) + 1)
    masks = (train_mask, val_mask, test_mask)

    print("\nTraining GCN (2-layer, normalized-adjacency matmuls)...")
    r_gcn = train_model("gcn", gcn, a_norm, x, y, masks, args.epochs)
    print("\nTraining GAT (8-head dense masked attention)...")
    r_gat = train_model("gat", gat, adj_mask, x, y, masks, args.epochs)

    print("\n" + "=" * 80)
    print("Comparison (best-val checkpoint)")
    print("=" * 80)
    print(f"{'model':6s} {'train':>8s} {'val':>8s} {'test':>8s}")
    for nm, r in (("GCN", r_gcn), ("GAT", r_gat)):
        print(f"{nm:6s} {r['train']:8.4f} {r['val']:8.4f} {r['test']:8.4f}")

    if args.figures:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        os.makedirs(args.figures, exist_ok=True)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))
        for nm, r, c in (("GCN", r_gcn, "tab:blue"), ("GAT", r_gat, "tab:red")):
            ax1.plot(r["losses"], color=c, label=nm)
            ax2.plot(r["val_accs"], color=c, label=nm)
        ax1.set_xlabel("Epoch"); ax1.set_ylabel("Training loss")
        ax2.set_xlabel("Epoch"); ax2.set_ylabel("Validation accuracy")
        for ax in (ax1, ax2):
            ax.grid(True, alpha=0.3); ax.legend()
        out = os.path.join(args.figures, "gcn_vs_gat.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
