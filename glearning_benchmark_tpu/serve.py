"""Batched inference from a training checkpoint (the serving path).

The reference has no inference surface at all: its best checkpoint is
reloaded in-process for the final test pass only (reference
trainer/train_ibtt.py:579-580), so a user who wants predictions on new
inputs must re-run the training script end to end. A production framework
needs a standalone serving path. This module restores a checkpoint,
rebuilds the exact model, tokenizes raw inputs through the SAME code paths
training used (byte-exact tokenizers, same vocab, same query handling),
and runs fixed-shape batched forwards jitted once per (batch, length)
bucket so repeated calls hit the compile cache instead of retracing.

TPU discipline: every forward is a static-shape jit. Inputs are padded to
power-of-two row counts and to the training-time length/node buckets, so
an arbitrary stream of requests compiles a handful of executables once and
then runs at steady-state device throughput.

Usage:
    from glearning_benchmark_tpu.serve import Predictor
    p = Predictor.from_checkpoint("out/best_run")     # model name stored
    out = p.predict_texts(["<bos> 0 1 <e> ... <q> has_cycle"])
    out = p.predict_graphs([Graph(...), ...])
    out["pred"]          # int class ids, or float values for zinc

Checkpoints written by this framework embed a ``serve`` metadata block
(train/trainer.py) holding everything needed to rebuild the model without
the training corpus; older checkpoints fall back to rebuilding the dataset
bundle from the stored config.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from .data.graphs import Graph, batch_graphs
from .tokenization.ibtt import encode_texts, tokenize_zinc_molecule
from .tokenization.pack import pad_sequences
from .tokenization.vocab import build_fixed_zinc_vocab
from .train.checkpoint import load_checkpoint, serving_meta
from .train.datasets import QUERY_TASKS, SPLITS, DatasetBundle
from .train.trainer import build_model


def _next_pow2(n: int, cap: int) -> int:
    b = 1
    while b < min(n, cap):
        b <<= 1
    # a non-power-of-two cap must stay the hard bucket ceiling (n <= cap
    # always holds here, so the clamped bucket still fits every row)
    return min(b, cap)


class Predictor:
    """Checkpoint-backed batched inference."""

    def __init__(self, model_name: str, config: dict, params: Any,
                 batch_stats: Any, vocab: Optional[Dict[str, int]],
                 serve: Dict[str, Any], max_batch: int = 512):
        self.model_name = model_name
        self.task = serve["task"]
        self.kind = serve["kind"]
        self.serve = serve
        self.vocab = vocab
        self.max_batch = max_batch
        bundle = DatasetBundle(
            task=self.task, kind=self.kind,
            splits={s: {"y": np.zeros(0)} for s in SPLITS},
            num_classes=serve["num_classes"], vocab=vocab,
            vocab_size=serve["vocab_size"], q_token_id=serve["q_token_id"],
            in_dim=serve["in_dim"], meta=dict(serve["meta"]))
        self.bundle = bundle
        self.model = build_model(model_name, config, bundle)
        self.variables = {"params": params}
        if batch_stats is not None:
            self.variables["batch_stats"] = batch_stats
        self._jit_cache: Dict[Any, Any] = {}
        self._tok = None  # lazy TrailTokenizer (agtt only)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, model_name: Optional[str] = None,
                        max_batch: int = 512) -> "Predictor":
        ckpt = load_checkpoint(path)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint at {path!r}")
        config = ckpt.get("config") or {}
        serve = ckpt.get("serve")
        if serve is None:
            # pre-serving checkpoint: rebuild the bundle from the stored
            # config (needs the corpus; new checkpoints are corpus-free)
            from .train.trainer import build_dataset
            if model_name is None:
                raise ValueError("old checkpoint without serve metadata: "
                                 "pass model_name=")
            seed = int(config.get("train", {}).get("seed", 0))
            bundle = build_dataset(model_name, config["dataset"], seed)
            serve = serving_meta(model_name, bundle)
            if ckpt.get("vocab") is None:
                ckpt["vocab"] = bundle.vocab
        name = model_name or serve["model_name"]
        return cls(name, config, ckpt["params"], ckpt.get("batch_stats"),
                   ckpt.get("vocab"), serve, max_batch=max_batch)

    # -- forward (static-shape jit per bucket) -----------------------------

    def _apply(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        key = (self.kind,) + tuple(sorted(
            (k, v.shape, str(v.dtype)) for k, v in batch.items()))
        fn = self._jit_cache.get(key)
        if fn is None:
            model, bundle = self.model, self.bundle

            if self.kind == "tokens":
                def fwd(variables, ids, mask):
                    return model.apply(variables, ids, mask,
                                       q_token_id=bundle.q_token_id,
                                       deterministic=True)
            else:
                def fwd(variables, node_feat, adj, mask, etype=None):
                    return model.apply(variables, node_feat, adj, mask,
                                       deterministic=True, etype=etype)
            fn = jax.jit(fwd)
            self._jit_cache[key] = fn
        if self.kind == "tokens":
            out = fn(self.variables, batch["ids"], batch["mask"])
        else:
            out = fn(self.variables, batch["node_feat"], batch["adj"],
                     batch["mask"], etype=batch.get("eadj"))
        return np.asarray(out)

    def _batched(self, rows: Dict[str, np.ndarray], n: int) -> np.ndarray:
        """Run n example rows through _apply in power-of-two row buckets so
        arbitrary request sizes reuse a handful of compiled shapes."""
        outs = []
        i = 0
        while i < n:
            take = min(self.max_batch, n - i)
            b = _next_pow2(take, self.max_batch)
            batch = {}
            for k, v in rows.items():
                chunk = v[i:i + take]
                if b > take:
                    # pad with COPIES of the first row, not zeros: the
                    # transformer's <bos>-pooling predicate is batch-global
                    # (jnp.all(x[:,0]==bos), reference train_ibtt.py:114-120),
                    # so an all-<pad> filler row would flip the whole batch
                    # to masked-mean pooling; padded outputs are sliced away
                    padrow = np.repeat(chunk[:1], b - take, axis=0)
                    chunk = np.concatenate([chunk, padrow], axis=0)
                batch[k] = chunk
            outs.append(self._apply(batch)[:take])
            i += take
        return np.concatenate(outs, axis=0) if outs else np.zeros((0,))

    # -- warmup (pre-compile the bucket grid at load time) ------------------

    def _proto_rows(self) -> Dict[str, np.ndarray]:
        """One representative input row, built through the REAL encoding
        paths so warmup compiles exactly the shapes/dtypes the predict
        paths produce (no shape guessing to drift)."""
        g = Graph(edges=np.asarray([[0, 1]], np.int32), num_nodes=2,
                  y=0.0 if self.task == "zinc" else 0,
                  node_labels=np.zeros(2, np.int32),
                  edge_labels=np.ones(1, np.int32),
                  query_u=0, query_v=1)
        if self.model_name == "agtt":
            return self._encode_trail_rows([g])
        if self.model_name in ("mpnn", "ggps"):
            return self._encode_graph_rows([g])
        if self.task == "zinc":
            text = tokenize_zinc_molecule(
                g, max_len=int(self.serve["meta"]["max_len"]))
            return self._encode_token_rows([text])
        return self._encode_token_rows(["<bos> <eos>"])

    def warmup(self, batch_buckets: Optional[Sequence[int]] = None
               ) -> Dict[int, float]:
        """Pre-compile the jitted forward for the given batch buckets
        (default: every power of two up to ``max_batch``), moving the
        first compile — ~30 s through a remote-compile tunnel
        (SERVE_BENCH.json r4 ibtt batch=1 cold) — out of the request
        path. Returns {bucket: seconds} per compiled bucket. Requested
        sizes round up to the power-of-two grid ``_batched`` actually
        uses, so a warmed bucket is exactly a served shape.
        """
        if batch_buckets is None:
            batch_buckets, b = [], 1
            while b <= self.max_batch:
                batch_buckets.append(b)
                b *= 2
        buckets = sorted({_next_pow2(int(b), self.max_batch)
                          for b in batch_buckets if b > 0})
        proto = self._proto_rows()
        timings: Dict[int, float] = {}
        for b in buckets:
            rows = {k: np.repeat(v, b, axis=0) for k, v in proto.items()}
            t0 = time.perf_counter()
            self._apply(rows)
            timings[int(b)] = round(time.perf_counter() - t0, 4)
        return timings

    # -- tokenization of raw inputs (same paths as training) ---------------

    def _encode_token_rows(self, texts: Sequence[str]) -> Dict[str, np.ndarray]:
        if self.vocab is None:
            raise ValueError("token-text prediction needs the checkpoint "
                             "vocab (ibtt checkpoints carry it)")
        bucket = int(self.serve["meta"]["max_len"])
        pad_id = int(self.serve["meta"].get("pad_id", self.vocab["<pad>"]))
        ids, lens = encode_texts(texts, self.vocab, max_len=bucket)
        n, l = ids.shape if ids.size else (len(texts), 0)
        out = np.full((n, bucket), pad_id, dtype=np.int32)
        if ids.size:
            out[:, :l] = ids
        mask = np.arange(bucket)[None, :] < lens[:, None]
        return {"ids": out, "mask": mask}

    def _trail_tokenizer(self):
        if self._tok is None:
            from .tokenization.sent import TrailTokenizer
            meta = self.serve["meta"]
            max_len = int(meta["max_len"])
            tok = TrailTokenizer(max_length=max_len, truncation_length=max_len,
                                 labeled_graph=self.task == "zinc",
                                 undirected=True)
            tok.set_num_nodes(int(meta["max_nodes"]))
            if self.task == "zinc":
                from .data.zinc import ZINC_NUM_ATOM_TYPES, ZINC_NUM_BOND_TYPES
                tok.set_num_node_and_edge_types(ZINC_NUM_ATOM_TYPES,
                                                ZINC_NUM_BOND_TYPES)
            self._tok = tok
        return self._tok

    def _encode_trail_rows(self, graphs: Sequence[Graph]) -> Dict[str, np.ndarray]:
        meta = self.serve["meta"]
        tok = self._trail_tokenizer()
        max_nodes = int(meta["max_nodes"])
        too_big = [g.num_nodes for g in graphs if g.num_nodes > max_nodes]
        if too_big:
            raise ValueError(
                f"graph with {max(too_big)} nodes exceeds this checkpoint's "
                f"position table ({max_nodes} nodes); retrain with a larger "
                "corpus or smaller graphs")
        fixed = build_fixed_zinc_vocab()[0] if self.task == "zinc" else None
        seqs = []
        for g in graphs:
            t = tok(g)
            if fixed is not None:
                t = tok.remap_zinc_tokens(t, fixed)
            if self.task in QUERY_TASKS and g.query_u is not None:
                t = tok.append_query(t, g.query_u,
                                     g.query_v if g.query_v is not None
                                     else g.query_u)
            seqs.append(t)
        bucket = int(meta["max_len"])
        pad_id = int(meta["pad_id"])
        seqs = [s[:bucket] for s in seqs]
        ids, mask = pad_sequences(seqs, pad_id=pad_id, max_len=bucket)
        n, l = ids.shape
        out = np.full((n, bucket), pad_id, dtype=np.int32)
        outm = np.zeros((n, bucket), dtype=bool)
        out[:, :l] = ids
        outm[:, :l] = mask
        return {"ids": out, "mask": outm}

    def _encode_graph_rows(self, graphs: Sequence[Graph]) -> Dict[str, np.ndarray]:
        meta = self.serve["meta"]
        n_max = int(meta["n_max"])
        too_big = [g.num_nodes for g in graphs if g.num_nodes > n_max]
        if too_big:
            raise ValueError(
                f"graph with {max(too_big)} nodes exceeds this checkpoint's "
                f"node bucket ({n_max} nodes)")
        is_zinc = self.task == "zinc"
        edge_features = getattr(self.model, "edge_features", False)
        graphs = [dataclasses.replace(g, y=0.0 if is_zinc else 0)
                  if g.y is None else g for g in graphs]
        gb = batch_graphs(
            graphs, n_max=n_max,
            node_feat_mode="labels" if is_zinc else "const",
            query_encoding=self.task in QUERY_TASKS,
            label_dtype=np.float32 if is_zinc else np.int32,
            edge_types=is_zinc)
        rows = {"node_feat": gb.node_feat.astype(np.float32),
                "adj": gb.adj.astype(np.float32),
                "mask": gb.node_mask}
        if edge_features and gb.eadj is not None:
            rows["eadj"] = gb.eadj.astype(np.int32)
        return rows

    # -- public API ---------------------------------------------------------

    def predict_texts(self, texts: Sequence[str]) -> Dict[str, np.ndarray]:
        """Predict from raw token-text records (ibtt). Everything after the
        first '<p>' is stripped before encoding, exactly like training
        (reference data_loader.py:479-481), so labeled records are safe."""
        if self.model_name != "ibtt":
            raise ValueError(f"{self.model_name} consumes graphs, not text; "
                             "use predict_graphs")
        rows = self._encode_token_rows(list(texts))
        return self._finish(self._batched(rows, len(texts)))

    def predict_graphs(self, graphs: Sequence[Graph]) -> Dict[str, np.ndarray]:
        """Predict from Graph inputs. Routes through the model's own
        serialization: SENT trails for agtt, dense batching for mpnn/ggps,
        the ZINC index tokenizer for ibtt-zinc."""
        graphs = list(graphs)
        if self.model_name == "agtt":
            rows = self._encode_trail_rows(graphs)
        elif self.model_name in ("mpnn", "ggps"):
            rows = self._encode_graph_rows(graphs)
        elif self.task == "zinc":  # ibtt on molecules -> index token text
            texts = [tokenize_zinc_molecule(
                dataclasses.replace(g, y=0.0) if g.y is None else g,
                max_len=int(self.serve["meta"]["max_len"]))
                for g in graphs]
            rows = self._encode_token_rows(texts)
        else:
            raise ValueError("ibtt on synthetic tasks consumes the token "
                             "text records; use predict_texts")
        return self._finish(self._batched(rows, len(graphs)))

    def _finish(self, logits: np.ndarray) -> Dict[str, np.ndarray]:
        if self.task == "zinc":
            return {"pred": logits.astype(np.float32)}
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        return {"pred": np.argmax(logits, axis=-1).astype(np.int32),
                "prob": probs.max(axis=-1), "logits": logits}


def predict_records(predictor: Predictor, records: Sequence[dict]) -> Dict[str, np.ndarray]:
    """Predict from loader-style example dicts ({'text': ..., ...}) using
    whichever input form the model consumes."""
    texts = [r["text"] for r in records]
    if predictor.model_name == "ibtt" and predictor.task != "zinc":
        return predictor.predict_texts(texts)
    from .data.text_grammar import text_record_to_graph
    graphs: List[Graph] = []
    for r in records:
        g = text_record_to_graph(r["text"], predictor.task,
                                 label=r.get("label"))
        if g is None:
            raise ValueError("record with no parseable graph")
        graphs.append(g)
    return predictor.predict_graphs(graphs)
