#!/usr/bin/env python
"""Train the REFERENCE's own PyTorch models on OUR corpora (CPU).

Settles the "beats-the-reference" claim same-data for three of the four
model families (VERDICT r3 next-step #1; GPS is blocked — its model lives
in the external GraphGPS repo absent from the snapshot):

- ibtt  (r3): the reference SimpleTransformer + TokenDataset + vocab
  (trainer/train_ibtt.py:24, graph_data_loader/data_loader.py:451-497)
  on our shortest_path corpora at reference HPs.
- agtt  (r4): the reference train_agtt.SimpleTransformer
  (trainer/train_agtt.py:35-148 — pure torch; AutoGraph is only needed
  for its tokenizer, which we stub) trained on the SAME SENT token
  sequences our agtt runs train on (build_agtt_dataset, campaign args).
- mpnn  (r4): the reference train_mpnn.MPNN (trainer/train_mpnn.py:17-95)
  on the SAME graphs our mpnn runs train on. torch_geometric is absent
  here, so GINConv / global_*_pool are implemented as faithful scatter
  stubs (PyG semantics: out_i = mlp((1+eps)*x_i + sum_{(j,i) in E} x_j),
  directed as-parsed edge_index exactly like the reference's
  GraphTokenDataset, nativegraph.py:386-391); the MPNN module itself,
  AdamW, clip(1.0) and CE are the reference's own.

    python tools/ref_crosscheck.py [--corpus default|small|both]  # ibtt
    python tools/ref_crosscheck.py --run agtt-cycle|agtt-sp|mpnn-cycle|mpnn-sp
    python tools/ref_crosscheck.py --run all-r4   # the four new rows

CPU-only torch; safe to run alongside nothing (no TPU claim needed, but
honor the single-client rule anyway: PALLAS_AXON_POOL_IPS= python ...).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

CORPORA = {
    # mirror tools/ablate_sp.py SP_BASE + tools/run_benchmarks.py ibtt-sp
    "default": {"root": "data/graph-token", "size_buckets": None},
    "small": {"root": "data/graph-token-small", "size_buckets": ["small"]},
    "medium": {"root": "data/graph-token-medium", "size_buckets": ["medium"]},
}

HP = {  # configs/ibtt_graph_token.yaml model/train sections (reference HPs)
    "d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 128, "p_drop": 0.1,
    "max_pos": 600, "max_len": 600, "batch_size": 128, "lr": 1e-3,
    "weight_decay": 1e-4, "seed": 0,
}


def _import_reference():
    if "wandb" not in sys.modules:  # reference imports it unconditionally
        sys.modules["wandb"] = types.ModuleType("wandb")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import trainer.train_ibtt as ref_ibtt
    import graph_data_loader.data_loader as ref_dl
    return ref_ibtt, ref_dl


def _stub_pyg_and_autograph():
    """torch_geometric / AutoGraph stand-ins so the reference's agtt and
    mpnn trainer modules import read-only without their absent deps. The
    message-passing stubs are REAL implementations with PyG semantics —
    they are the crosscheck's compute path (documented in the header)."""
    import torch
    import torch.nn as nn

    if "torch_geometric" in sys.modules:
        return
    tg = types.ModuleType("torch_geometric")
    tg_ds = types.ModuleType("torch_geometric.datasets")
    tg_ds.ZINC = object
    tg_data = types.ModuleType("torch_geometric.data")

    class Data:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    tg_data.Data = Data
    tg_data.InMemoryDataset = object
    tg_loader = types.ModuleType("torch_geometric.loader")
    tg_loader.DataLoader = object  # unused: we batch manually
    tg_nn = types.ModuleType("torch_geometric.nn")

    class GINConv(nn.Module):
        """PyG GINConv: out = nn((1 + eps) * x + sum_{(j,i) in E} x_j)."""

        def __init__(self, nn_module, train_eps=False, eps=0.0):
            super().__init__()
            self.nn = nn_module
            if train_eps:
                self.eps = nn.Parameter(torch.tensor(float(eps)))
            else:
                self.register_buffer("eps", torch.tensor(float(eps)))

        def forward(self, x, edge_index):
            agg = torch.zeros_like(x).index_add_(0, edge_index[1],
                                                 x[edge_index[0]])
            return self.nn((1.0 + self.eps) * x + agg)

    def _segment(x, batch, reduce):
        n_seg = int(batch.max()) + 1 if batch.numel() else 0
        if reduce == "max":
            out = torch.full((n_seg, x.size(1)), float("-inf"), dtype=x.dtype)
            out.index_reduce_(0, batch, x, "amax", include_self=True)
            return out
        out = torch.zeros((n_seg, x.size(1)), dtype=x.dtype)
        out.index_add_(0, batch, x)
        if reduce == "mean":
            cnt = torch.zeros(n_seg, dtype=x.dtype).index_add_(
                0, batch, torch.ones(x.size(0), dtype=x.dtype))
            out = out / cnt.clamp(min=1).unsqueeze(1)
        return out

    tg_nn.GINConv = GINConv
    tg_nn.global_mean_pool = lambda x, b: _segment(x, b, "mean")
    tg_nn.global_add_pool = lambda x, b: _segment(x, b, "add")
    tg_nn.global_max_pool = lambda x, b: _segment(x, b, "max")

    tg.datasets, tg.data, tg.loader, tg.nn = tg_ds, tg_data, tg_loader, tg_nn
    for name, mod in (("torch_geometric", tg),
                      ("torch_geometric.datasets", tg_ds),
                      ("torch_geometric.data", tg_data),
                      ("torch_geometric.loader", tg_loader),
                      ("torch_geometric.nn", tg_nn)):
        sys.modules[name] = mod

    # AutoGraph: train_agtt imports only Graph2TrailTokenizer; the crosscheck
    # never constructs it (our SENT sequences are the data), but the class
    # attribute `pad` is referenced at class scope in collate paths.
    ag = types.ModuleType("autograph")
    ag_dm = types.ModuleType("autograph.datamodules")
    ag_d = types.ModuleType("autograph.datamodules.data")
    ag_tok = types.ModuleType("autograph.datamodules.data.tokenizer")

    class Graph2TrailTokenizer:
        pad = 5

    ag_tok.Graph2TrailTokenizer = Graph2TrailTokenizer
    for name, mod in (("autograph", ag), ("autograph.datamodules", ag_dm),
                      ("autograph.datamodules.data", ag_d),
                      ("autograph.datamodules.data.tokenizer", ag_tok)):
        sys.modules[name] = mod


def _load_examples(corpus: str):
    """Same examples the JAX ibtt-sp run trains on (train/datasets.py)."""
    from glearning_benchmark_tpu.data.generator import generate_corpus
    from glearning_benchmark_tpu.data.loader import (
        load_examples_multi_algorithm)
    spec = CORPORA[corpus]
    root = spec["root"]
    # generate_corpus is incremental per (task, algo) at the current
    # GENERATOR_VERSION — always call it (a root that only ever ran
    # cycle_check would otherwise yield 0 shortest_path examples)
    generate_corpus(root, tasks=["cycle_check", "shortest_path"],
                    number_of_graphs=500, seed=1234,
                    size_buckets=spec["size_buckets"])
    kw = dict(use_split_tasks_dirs=True, seed=HP["seed"], num_graphs=500,
              num_pairs_per_graph=10)
    return (load_examples_multi_algorithm(root, "shortest_path", ["path"],
                                          "train", **kw),
            load_examples_multi_algorithm(root, "shortest_path", ["path"],
                                          "val", **kw))


def run_one(corpus: str, epochs: int) -> dict:
    import torch
    from torch.utils.data import DataLoader

    ref_ibtt, ref_dl = _import_reference()
    train_ex, val_ex = _load_examples(corpus)
    print(f"[{corpus}] {len(train_ex)} train / {len(val_ex)} val examples")

    torch.manual_seed(HP["seed"])
    vocab, _ = ref_dl.build_vocab_from_texts([e["text"] for e in train_ex])
    ds_tr = ref_dl.TokenDataset(train_ex, vocab, max_len=HP["max_len"])
    ds_va = ref_dl.TokenDataset(val_ex, vocab, max_len=HP["max_len"])
    pad = vocab["<pad>"]
    coll = lambda b: ref_dl.collate(b, pad)  # noqa: E731
    dl_tr = DataLoader(ds_tr, batch_size=HP["batch_size"], shuffle=True,
                       collate_fn=coll)
    dl_va = DataLoader(ds_va, batch_size=HP["batch_size"], shuffle=False,
                       collate_fn=coll)

    model = ref_ibtt.SimpleTransformer(
        vocab_size=len(vocab), d_model=HP["d_model"], nhead=HP["nhead"],
        nlayers=HP["nlayers"], d_ff=HP["d_ff"], p_drop=HP["p_drop"],
        max_pos=HP["max_pos"], num_classes=7, use_query_nodes=True,
        task="shortest_path")
    opt = torch.optim.AdamW(model.parameters(), lr=HP["lr"],
                            weight_decay=HP["weight_decay"])
    crit = torch.nn.CrossEntropyLoss()

    @torch.no_grad()
    def val_acc() -> float:
        model.eval()
        hit = n = 0
        for X, A, Y in dl_va:
            pred = model(X, A, vocab=vocab).argmax(-1)
            hit += int((pred == Y).sum())
            n += len(Y)
        return hit / max(n, 1)

    best, hist, t0 = 0.0, [], time.time()
    for ep in range(1, epochs + 1):
        model.train()
        for X, A, Y in dl_tr:
            opt.zero_grad(set_to_none=True)
            loss = crit(model(X, A, vocab=vocab), Y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        acc = val_acc()
        best = max(best, acc)
        hist.append(round(acc, 4))
        print(f"[{corpus}] epoch {ep:3d} val_acc {acc:.4f} "
              f"(best {best:.4f}, {time.time() - t0:.0f}s)", flush=True)
    return {"corpus": corpus, "epochs": epochs, "best_val_acc": best,
            "val_acc_history": hist, "train_examples": len(train_ex),
            "val_examples": len(val_ex), "wall_s": round(time.time() - t0, 1)}


# Campaign-identical dataset specs (tools/run_benchmarks.py RUNS_FULL +
# configs/{agtt,mpnn}_graph_token.yaml). pack=False: the reference trains
# unpacked rows; packing is our TPU-efficiency layout over the SAME examples.
R4_RUNS = {
    "agtt-cycle": dict(
        family="agtt", epochs=100,
        ds={"graph_token_root": "data/graph-token", "task": "cycle_check",
            "train_algorithms": ["ba", "sbm"], "test_algorithm": "sfn",
            "use_split_tasks_dirs": True, "num_graphs": 500,
            "num_pairs_per_graph": 10, "max_len": 600,
            "generate_num_graphs": 500, "pack": False}),
    "agtt-sp": dict(
        family="agtt", epochs=300,
        ds={"graph_token_root": "data/graph-token", "task": "shortest_path",
            "train_algorithms": ["path"], "test_algorithm": "er",
            "use_split_tasks_dirs": True, "num_graphs": 500,
            "num_pairs_per_graph": 10, "max_len": 600,
            "generate_num_graphs": 500, "pack": False}),
    "mpnn-cycle": dict(
        family="mpnn", epochs=100,
        ds={"graph_token_root": "data/graph-token", "task": "cycle_check",
            "train_algorithms": ["ba", "sbm"], "test_algorithm": "sfn",
            "use_split_tasks_dirs": True, "num_graphs": 500,
            "num_pairs_per_graph": 10, "generate_num_graphs": 500}),
    "mpnn-sp": dict(
        family="mpnn", epochs=300,
        ds={"graph_token_root": "data/graph-token", "task": "shortest_path",
            "train_algorithms": ["er", "sbm", "path"], "test_algorithm": "ba",
            "use_split_tasks_dirs": True, "num_graphs": 300,
            "num_pairs_per_graph": 10, "generate_num_graphs": 500}),
    # r5: the fourth family (VERDICT r4 next-step #3) — same dataset specs
    # as the gps campaign runs (configs/gps_graph_token.yaml +
    # tools/run_benchmarks.py gps-cycle/gps-sp overrides)
    "gps-cycle": dict(
        family="gps", epochs=100,
        ds={"graph_token_root": "data/graph-token", "task": "cycle_check",
            "train_algorithms": ["ba", "sbm"], "test_algorithm": "sfn",
            "use_split_tasks_dirs": True, "num_graphs": 500,
            "num_pairs_per_graph": 10, "generate_num_graphs": 500}),
    "gps-sp": dict(
        family="gps", epochs=300,
        ds={"graph_token_root": "data/graph-token", "task": "shortest_path",
            "train_algorithms": ["er", "sbm", "path"], "test_algorithm": "ba",
            "use_split_tasks_dirs": True, "num_graphs": 300,
            "num_pairs_per_graph": 10, "generate_num_graphs": 500}),
}

AGTT_HP = {  # configs/agtt_graph_token.yaml model/train sections
    "d_model": 32, "nhead": 4, "nlayers": 4, "d_ff": 128, "p_drop": 0.1,
    "batch_size": 128, "lr": 1e-3, "weight_decay": 1e-4, "seed": 0,
}
MPNN_HP = {  # configs/mpnn_graph_token.yaml model/train sections
    "hidden_dim": 64, "num_layers": 5, "dropout": 0.1, "pooling": "mean",
    "batch_size": 128, "lr": 1e-3, "weight_decay": 1e-5, "seed": 0,
}
GPS_HP = {  # reference configs/gps_graph_token.yaml gt/optim sections
    "dim": 32, "layers": 4, "heads": 4, "dropout": 0.0, "attn_dropout": 0.1,
    "batch_size": 128, "lr": 1e-3, "weight_decay": 1e-5, "warmup_epochs": 5,
    "seed": 0,
}


def _epoch_loop(name, model, opt, crit, n_train, make_batches, val_fn,
                epochs, shuffle_rng):
    """Shared loop: AdamW + clip(1.0) + CE, best-val tracking — the
    reference's per-epoch recipe (train_agtt.py:305-318,
    train_mpnn.py:100-117). ``make_batches(perm)`` re-collates each epoch
    from an example-level shuffle, exactly like the reference's
    DataLoader(shuffle=True) + per-batch-max padding collate."""
    import torch

    best, hist, t0 = 0.0, [], time.time()
    for ep in range(1, epochs + 1):
        model.train()
        perm = torch.randperm(n_train, generator=shuffle_rng)
        for args, y in make_batches(perm):
            opt.zero_grad(set_to_none=True)
            loss = crit(model(*args), y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        acc = val_fn()
        best = max(best, acc)
        hist.append(round(acc, 4))
        print(f"[{name}] epoch {ep:3d} val_acc {acc:.4f} "
              f"(best {best:.4f}, {time.time() - t0:.0f}s)", flush=True)
    return best, hist, time.time() - t0


def run_agtt(name: str, epochs: int, ds_cfg: dict) -> dict:
    """The reference's own train_agtt.SimpleTransformer on the SAME SENT
    token arrays our agtt campaign run trains on (build_agtt_dataset)."""
    import torch

    _stub_pyg_and_autograph()
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import trainer.train_agtt as ref_agtt

    from glearning_benchmark_tpu.train.datasets import build_agtt_dataset
    task = ds_cfg["task"]
    bundle = build_agtt_dataset(ds_cfg, seed=AGTT_HP["seed"])
    tr, va = bundle.splits["train"], bundle.splits["val"]
    print(f"[{name}] {len(tr['y'])} train / {len(va['y'])} val sequences, "
          f"vocab_size={bundle.vocab_size}, bucket={tr['ids'].shape[1]}")

    torch.manual_seed(AGTT_HP["seed"])
    use_q = task == "shortest_path"
    idx_offset = bundle.meta["idx_offset"]
    max_nodes = bundle.meta["max_nodes"]
    if use_q:
        # the reference derives q_token_id = idx_offset + num_nodes from the
        # batch's first graph (train_agtt.py:127-133); our sequences pin it
        # dataset-wide (deviation #3) — hand the model a stub whose
        # num_nodes makes both conventions agree, and assert they do
        assert idx_offset + max_nodes == bundle.q_token_id
    data_stub = [types.SimpleNamespace(num_nodes=max_nodes)]

    max_pos = max(tr["ids"].shape[1], va["ids"].shape[1])
    model = ref_agtt.SimpleTransformer(
        vocab_size=bundle.vocab_size, d_model=AGTT_HP["d_model"],
        nhead=AGTT_HP["nhead"], nlayers=AGTT_HP["nlayers"],
        d_ff=AGTT_HP["d_ff"], p_drop=AGTT_HP["p_drop"], max_pos=max_pos,
        num_classes=bundle.num_classes, use_query_nodes=use_q,
        tokenizer_idx_offset=idx_offset, task=task)
    opt = torch.optim.AdamW(model.parameters(), lr=AGTT_HP["lr"],
                            weight_decay=AGTT_HP["weight_decay"])
    crit = torch.nn.CrossEntropyLoss()

    def to_tensors(split):
        return (torch.from_numpy(np.ascontiguousarray(split["ids"])).long(),
                torch.from_numpy(np.ascontiguousarray(split["mask"])),
                torch.from_numpy(np.ascontiguousarray(split["y"])).long())

    ids_tr, mask_tr, y_tr = to_tensors(tr)
    ids_va, mask_va, y_va = to_tensors(va)
    lens_tr = mask_tr.sum(1)
    bs = AGTT_HP["batch_size"]

    def make_batches(perm):
        # reference collate pads each batch to ITS max length
        # (train_agtt.py:276-302); our arrays are bucket-padded, so trim
        for s in range(0, len(perm), bs):
            idx = perm[s:s + bs]
            lmax = max(int(lens_tr[idx].max()), 1)
            yield ((ids_tr[idx, :lmax], mask_tr[idx, :lmax], data_stub),
                   y_tr[idx])

    @torch.no_grad()
    def val_acc() -> float:
        model.eval()
        hit = tot = 0
        for s in range(0, len(y_va), bs):
            ids_b, mask_b = ids_va[s:s + bs], mask_va[s:s + bs]
            lmax = max(int(mask_b.sum(1).max()), 1)
            pred = model(ids_b[:, :lmax], mask_b[:, :lmax],
                         data_stub).argmax(-1)
            hit += int((pred == y_va[s:s + bs]).sum())
            tot += len(ids_b)
        return hit / max(tot, 1)

    g = torch.Generator().manual_seed(AGTT_HP["seed"])
    best, hist, wall = _epoch_loop(name, model, opt, crit, len(y_tr),
                                   make_batches, val_acc, epochs, g)
    return {"run": name, "family": "agtt", "task": task, "epochs": epochs,
            "best_val_acc": best, "val_acc_history": hist,
            "train_examples": len(tr["y"]), "val_examples": len(va["y"]),
            "wall_s": round(wall, 1)}


def run_mpnn(name: str, epochs: int, ds_cfg: dict) -> dict:
    """The reference's own train_mpnn.MPNN (GIN) on the SAME graphs our
    mpnn campaign run trains on, batched block-diagonally like PyG."""
    import torch

    _stub_pyg_and_autograph()
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import graph_data_loader.graph_token_dataset_nativegraph as ref_ng
    import trainer.train_mpnn as ref_mpnn

    from glearning_benchmark_tpu.train.datasets import _load_synthetic_graphs
    task = ds_cfg["task"]
    graphs = _load_synthetic_graphs(ds_cfg, seed=MPNN_HP["seed"])
    use_q = task == "shortest_path"

    def to_items(gs):
        """Reference Data assembly per graph (nativegraph.py:386-410:
        directed as-parsed edge_index, x=ones(N,1) [+ query columns])."""
        items = []
        for gr in gs:
            n = gr.num_nodes
            x = torch.ones((n, 1), dtype=torch.float)
            if use_q:
                x = ref_ng.add_query_encoding_to_features(
                    x, int(gr.query_u), int(gr.query_v))
            e = (torch.from_numpy(np.ascontiguousarray(gr.edges)).long().t()
                 if len(gr.edges) else torch.empty((2, 0), dtype=torch.long))
            items.append((x, e, n, int(gr.y)))
        return items

    def collate(chunk):
        """PyG-style block-diagonal batch."""
        xs, eis, bvec, ys, off = [], [], [], [], 0
        for bi, (x, e, n, y) in enumerate(chunk):
            xs.append(x)
            eis.append(e + off)
            bvec.append(torch.full((n,), bi, dtype=torch.long))
            ys.append(y)
            off += n
        data = types.SimpleNamespace(
            x=torch.cat(xs), edge_index=torch.cat(eis, dim=1),
            batch=torch.cat(bvec))
        return (data,), torch.tensor(ys, dtype=torch.long)

    torch.manual_seed(MPNN_HP["seed"])
    num_classes = 7 if use_q else 2
    in_dim = 3 if use_q else 1
    model = ref_mpnn.MPNN(
        in_dim=in_dim, hidden_dim=MPNN_HP["hidden_dim"],
        num_layers=MPNN_HP["num_layers"], dropout=MPNN_HP["dropout"],
        pooling=MPNN_HP["pooling"], num_classes=num_classes, task=task)
    opt = torch.optim.AdamW(model.parameters(), lr=MPNN_HP["lr"],
                            weight_decay=MPNN_HP["weight_decay"])
    crit = torch.nn.CrossEntropyLoss()

    train_items = to_items(graphs["train"])
    val_b = []
    bs = MPNN_HP["batch_size"]
    val_items = to_items(graphs["val"])
    for s in range(0, len(val_items), bs):
        val_b.append(collate(val_items[s:s + bs]))
    print(f"[{name}] {len(graphs['train'])} train / {len(graphs['val'])} "
          f"val graphs, in_dim={in_dim}")

    def make_batches(perm):
        # example-level shuffle + re-collate each epoch, like the
        # reference's PyG DataLoader(shuffle=True) (BatchNorm statistics
        # depend on batch composition, so grouping must vary per epoch)
        for s in range(0, len(perm), bs):
            yield collate([train_items[int(i)] for i in perm[s:s + bs]])

    @torch.no_grad()
    def val_acc() -> float:
        model.eval()
        hit = tot = 0
        for args, y in val_b:
            pred = model(*args).argmax(-1)
            hit += int((pred == y).sum())
            tot += len(y)
        return hit / max(tot, 1)

    g = torch.Generator().manual_seed(MPNN_HP["seed"])
    best, hist, wall = _epoch_loop(name, model, opt, crit, len(train_items),
                                   make_batches, val_acc, epochs, g)
    return {"run": name, "family": "mpnn", "task": task, "epochs": epochs,
            "best_val_acc": best, "val_acc_history": hist,
            "train_examples": len(graphs["train"]),
            "val_examples": len(graphs["val"]), "wall_s": round(wall, 1)}


def _build_gps_stub(in_dim: int, dim_out: int):
    """Spec-faithful torch GPS model (the GraphGPS repo is absent from the
    reference snapshot, so this is a RECONSTRUCTION from the reference's own
    spec surfaces, not the unobservable GraphGPS code):

    - layer recipe: reference docs/models/ggps.md:93-160 — sequential
      residuals h+=LocalGIN; h+=GlobalAttn; h+=FFN, GIN local model per
      gt.layer_type 'GIN+Transformer' (configs/gps_graph_token.yaml:41)
    - norms: BatchNorm1d after each residual (gt.batch_norm: true,
      gt.layer_norm: false)
    - node encoder: Linear(in_dim, 32) (dataset.node_encoder_name
      'LinearNode'; no positional-encoding sections in the config, so
      h0 = Linear(x) with no PE term)
    - attention: torch MultiheadAttention(32, 4, dropout=attn_dropout)
      over each graph's densified node axis (docs/models/ggps.md:131-137:
      "full self-attention over nodes" with batch membership masking)
    - FFN: 2x expansion with gt.dropout inside — mirrors the same reading
      our models/gps.py uses, so the crosscheck compares like-for-like
    - head: mean pool + Linear(32, dim_out) (model.graph_pooling 'mean',
      gnn.head 'graph', gnn.layers_post_mp: 1)
    """
    import torch
    import torch.nn as nn

    from torch_geometric.nn import GINConv  # the stub registered above

    dim = GPS_HP["dim"]

    class GPSLayerStub(nn.Module):
        def __init__(self):
            super().__init__()
            self.gin = GINConv(nn.Sequential(
                nn.Linear(dim, dim), nn.ReLU(), nn.Linear(dim, dim)))
            self.attn = nn.MultiheadAttention(
                dim, GPS_HP["heads"], dropout=GPS_HP["attn_dropout"],
                batch_first=True)
            self.bn_local = nn.BatchNorm1d(dim)
            self.bn_attn = nn.BatchNorm1d(dim)
            self.bn_ff = nn.BatchNorm1d(dim)
            self.ff1 = nn.Linear(dim, 2 * dim)
            self.ff2 = nn.Linear(2 * dim, dim)
            self.drop = nn.Dropout(GPS_HP["dropout"])

        def forward(self, h, edge_index, dense_idx, pad_mask):
            h = self.bn_local(h + self.drop(self.gin(h, edge_index)))
            # densify per graph for global attention (GraphGPS
            # to_dense_batch equivalent): dense_idx maps flat node i ->
            # (graph, slot); pad_mask True = padding slot
            b, nmax = pad_mask.shape
            dense = h.new_zeros((b, nmax, h.size(1)))
            dense[dense_idx[0], dense_idx[1]] = h
            attn_out, _ = self.attn(dense, dense, dense,
                                    key_padding_mask=pad_mask,
                                    need_weights=False)
            h = self.bn_attn(h + self.drop(
                attn_out[dense_idx[0], dense_idx[1]]))
            y = self.ff2(self.drop(torch.relu(self.ff1(h))))
            return self.bn_ff(h + self.drop(y))

    class GPSStub(nn.Module):
        def __init__(self):
            super().__init__()
            self.node_encoder = nn.Linear(in_dim, dim)
            self.layers = nn.ModuleList(
                GPSLayerStub() for _ in range(GPS_HP["layers"]))
            self.head = nn.Linear(dim, dim_out)

        def forward(self, data):
            h = self.node_encoder(data.x)
            for layer in self.layers:
                h = layer(h, data.edge_index, data.dense_idx, data.pad_mask)
            # mean pool per graph
            n_seg = data.pad_mask.size(0)
            pooled = h.new_zeros((n_seg, h.size(1))).index_add_(
                0, data.batch, h)
            cnt = h.new_zeros(n_seg).index_add_(
                0, data.batch, h.new_ones(h.size(0)))
            return self.head(pooled / cnt.clamp(min=1).unsqueeze(1))

    return GPSStub()


def run_gps(name: str, epochs: int, ds_cfg: dict) -> dict:
    """Spec-faithful torch GPS (``_build_gps_stub``) on the SAME graphs our
    gps campaign runs train on, with the reference's wrapper/optimizer
    behavior (train_ggps.py:110-148 loss handling incl. the cycle_check
    1-logit head trained through CrossEntropyLoss' probability-target mode
    — the reference's actual observable behavior, kept verbatim;
    train_ggps.py:419-443 AdamW + cosine_with_warmup + clip(1.0))."""
    import math

    import torch

    _stub_pyg_and_autograph()

    from glearning_benchmark_tpu.train.datasets import _load_synthetic_graphs

    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import graph_data_loader.graph_token_dataset_nativegraph as ref_ng

    task = ds_cfg["task"]
    graphs = _load_synthetic_graphs(ds_cfg, seed=GPS_HP["seed"])
    use_q = task == "shortest_path"

    def to_items(gs):
        """Reference Data assembly (same as run_mpnn: nativegraph.py
        directed as-parsed edge_index, x=ones(N,1) [+ query columns] —
        train_ggps.py:398-400 reads dim_in from exactly these features)."""
        items = []
        for gr in gs:
            n = gr.num_nodes
            x = torch.ones((n, 1), dtype=torch.float)
            if use_q:
                x = ref_ng.add_query_encoding_to_features(
                    x, int(gr.query_u), int(gr.query_v))
            e = (torch.from_numpy(np.ascontiguousarray(gr.edges)).long().t()
                 if len(gr.edges) else torch.empty((2, 0), dtype=torch.long))
            items.append((x, e, n, int(gr.y)))
        return items

    def collate(chunk):
        """Block-diagonal batch + the dense-attention index maps."""
        xs, eis, bvec, ys, off = [], [], [], [], 0
        ns = [n for (_, _, n, _) in chunk]
        nmax = max(ns)
        for bi, (x, e, n, y) in enumerate(chunk):
            xs.append(x)
            eis.append(e + off)
            bvec.append(torch.full((n,), bi, dtype=torch.long))
            ys.append(y)
            off += n
        batch = torch.cat(bvec)
        slot = torch.cat([torch.arange(n) for n in ns])
        pad_mask = torch.ones((len(chunk), nmax), dtype=torch.bool)
        pad_mask[batch, slot] = False
        data = types.SimpleNamespace(
            x=torch.cat(xs), edge_index=torch.cat(eis, dim=1), batch=batch,
            dense_idx=(batch, slot), pad_mask=pad_mask)
        return (data,), torch.tensor(ys, dtype=torch.long)

    torch.manual_seed(GPS_HP["seed"])
    # dim_out per train_ggps.py:390-396: 1 for cycle_check (BCE-style
    # single logit), num_classes for shortest_path
    dim_out = 7 if use_q else 1
    in_dim = 3 if use_q else 1
    model = _build_gps_stub(in_dim, dim_out)
    opt = torch.optim.AdamW(model.parameters(), lr=GPS_HP["lr"],
                            weight_decay=GPS_HP["weight_decay"])
    ce = torch.nn.CrossEntropyLoss()

    def crit(pred, y):
        if use_q:
            return ce(pred, y)
        # the reference's cycle_check path (train_ggps.py:131-134):
        # pred.squeeze() -> [B] single logits, target float -> CE falls
        # into probability-target mode over the batch axis. Kept verbatim
        # — it is what the reference's own training computes.
        return ce(pred.squeeze(-1), y.float())

    warm, maxep = GPS_HP["warmup_epochs"], epochs

    def lr_lambda(ep):  # cosine_with_warmup, per-epoch (GraphGym steps/epoch)
        if ep < warm:
            return (ep + 1) / warm
        prog = (ep - warm) / max(1, maxep - warm)
        return 0.5 * (1.0 + math.cos(math.pi * prog))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)

    train_items = to_items(graphs["train"])
    val_items = to_items(graphs["val"])
    bs = GPS_HP["batch_size"]
    val_b = [collate(val_items[s:s + bs])
             for s in range(0, len(val_items), bs)]
    print(f"[{name}] {len(train_items)} train / {len(val_items)} val "
          f"graphs, in_dim={in_dim}, dim_out={dim_out}")

    def make_batches(perm):
        for s in range(0, len(perm), bs):
            idx = perm[s:s + bs]
            if not use_q and len(idx) < 2:
                # the reference's cycle loss is a batch-axis softmax; a
                # singleton batch is degenerate (and 0-dim squeeze would
                # crash CE) — skip it like a drop_last loader would
                continue
            yield collate([train_items[int(i)] for i in idx])

    @torch.no_grad()
    def val_acc() -> float:
        model.eval()
        hit = tot = 0
        for args, y in val_b:
            pred = model(*args)
            if use_q:
                p = pred.argmax(-1)
            else:  # metrics.py:62-64 single-logit path
                p = (torch.sigmoid(pred.squeeze(-1)) > 0.5).long()
            hit += int((p == y).sum())
            tot += len(y)
        return hit / max(tot, 1)

    g = torch.Generator().manual_seed(GPS_HP["seed"])
    best, hist, t0 = 0.0, [], time.time()
    for ep in range(1, epochs + 1):
        model.train()
        perm = torch.randperm(len(train_items), generator=g)
        for args, y in make_batches(perm):
            opt.zero_grad(set_to_none=True)
            loss = crit(model(*args), y)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        sched.step()
        acc = val_acc()
        best = max(best, acc)
        hist.append(round(acc, 4))
        print(f"[{name}] epoch {ep:3d} val_acc {acc:.4f} "
              f"(best {best:.4f}, {time.time() - t0:.0f}s)", flush=True)
    return {"run": name, "family": "gps", "task": task, "epochs": epochs,
            "best_val_acc": best, "val_acc_history": hist,
            "train_examples": len(train_items),
            "val_examples": len(val_items),
            "wall_s": round(time.time() - t0, 1),
            "stub_note": "spec-faithful torch GPS reconstruction "
                         "(docs/models/ggps.md:93-160 + gt config), NOT "
                         "the unobservable GraphGPS code; see "
                         "_build_gps_stub docstring for the documented "
                         "fidelity assumptions"}


def harvest(log_path: str, corpus: str, out: str) -> None:
    """Recover a partial run's per-epoch history from its log (the run only
    writes JSON at completion; a wall-clock-killed run still leaves every
    epoch line in the log)."""
    import re
    pat = re.compile(r"epoch\s+(\d+) val_acc ([0-9.]+)")
    hist = []
    for line in open(log_path):
        m = pat.search(line)
        if m:
            hist.append((int(m.group(1)), float(m.group(2))))
    hist.sort()
    accs = [a for _, a in hist]
    results = json.load(open(out)) if os.path.exists(out) else {}
    results[corpus] = {"corpus": corpus, "epochs": len(accs),
                       "best_val_acc": max(accs) if accs else 0.0,
                       "val_acc_history": accs, "partial": True}
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[harvest] {corpus}: {len(accs)} epochs, "
          f"best {max(accs) if accs else 0:.4f} -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="both",
                    choices=["default", "small", "medium", "both"])
    ap.add_argument("--run", default=None,
                    choices=sorted(R4_RUNS) + ["all-r4", "all-r5"],
                    help="agtt/mpnn/gps same-corpus rows (overrides "
                         "--corpus; all-r5 = the two gps rows)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override (default: 150 ibtt; campaign epochs r4)")
    ap.add_argument("--out", default="REF_CROSSCHECK.json")
    ap.add_argument("--threads", type=int, default=None)
    ap.add_argument("--harvest", default=None, metavar="LOG",
                    help="parse a (possibly partial) run log into --out "
                         "instead of training")
    args = ap.parse_args()
    if args.harvest:
        harvest(args.harvest, args.corpus, args.out)
        return

    import torch
    torch.set_num_threads(args.threads or os.cpu_count() or 4)

    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))

    if args.run:
        names = {"all-r4": [n for n in sorted(R4_RUNS)
                            if R4_RUNS[n]["family"] != "gps"],
                 "all-r5": [n for n in sorted(R4_RUNS)
                            if R4_RUNS[n]["family"] == "gps"],
                 }.get(args.run, [args.run])
        for name in names:
            spec = R4_RUNS[name]
            fn = {"agtt": run_agtt, "mpnn": run_mpnn,
                  "gps": run_gps}[spec["family"]]
            results[name] = fn(name, args.epochs or spec["epochs"],
                               spec["ds"])
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
            print(f"[done] {name}: best_val "
                  f"{results[name]['best_val_acc']:.4f} -> {args.out}")
        return

    names = ["default", "small"] if args.corpus == "both" else [args.corpus]
    for name in names:
        results[name] = run_one(name, args.epochs or 150)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[done] {name}: best_val {results[name]['best_val_acc']:.4f}"
              f" -> {args.out}")


if __name__ == "__main__":
    main()
