"""Serving path (serve.Predictor + predict.py): checkpoint-restored batched
inference must agree with the trained model's own eval forward, be invariant
to request batching, and run corpus-free off the checkpoint's serve block.

The reference has no inference surface (its best checkpoint is reloaded
in-process for the final test pass only, train_ibtt.py:579-580) — this is a
new framework capability, so the tests pin its contract."""

import json
import tempfile

import jax
import numpy as np
import pytest

from glearning_benchmark_tpu.data.loader import (
    load_examples_multi_algorithm,
    load_graphs_multi_algorithm,
)
from glearning_benchmark_tpu.serve import Predictor, predict_records
from glearning_benchmark_tpu.train.checkpoint import load_checkpoint
from glearning_benchmark_tpu.train.trainer import build_dataset, train

LOAD_KW = dict(use_split_tasks_dirs=True, seed=0, num_graphs=20)


def _cfg(root, out_dir, model_name, epochs=2):
    model = {"d_model": 16, "nhead": 4, "nlayers": 1, "d_ff": 32,
             "dropout": 0.1, "max_pos": 600, "compute_dtype": "float32"}
    if model_name == "mpnn":
        model = {"hidden_dim": 16, "num_layers": 2, "dropout": 0.1,
                 "compute_dtype": "float32"}
    return {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 20,
                    "max_len": 600, "max_vocab": 600, "generate_num_graphs": 20},
        "model": model,
        "train": {"batch_size": 16, "epochs": epochs, "lr": 2e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": out_dir, "run_name": "r"},
        "wandb": {"use": False},
    }


def _trained(tmp_path, model_name):
    root = tempfile.mkdtemp()
    out = str(tmp_path)
    cfg = _cfg(root, out, model_name)
    train(cfg, model_name, verbose=False)
    return root, out, cfg


def test_checkpoint_carries_serve_block(tmp_path):
    root, out, _ = _trained(tmp_path, "ibtt")
    ckpt = load_checkpoint(f"{out}/best_r")
    sv = ckpt.get("serve")
    assert sv and sv["model_name"] == "ibtt" and sv["kind"] == "tokens"
    assert sv["num_classes"] == 2 and sv["vocab_size"] > 0
    assert "max_len" in sv["meta"] and "pad_id" in sv["meta"]


def test_serve_ibtt_matches_eval_forward(tmp_path):
    root, out, cfg = _trained(tmp_path, "ibtt")
    p = Predictor.from_checkpoint(f"{out}/best_r")
    ex = load_examples_multi_algorithm(root, "cycle_check", ["ba"], "val",
                                       **LOAD_KW)
    texts = [e["text"] for e in ex]
    got = p.predict_texts(texts)
    assert got["pred"].shape == (len(texts),)
    assert got["logits"].shape == (len(texts), 2)

    # agreement with the model's own eval forward on the training bundle's
    # encoding of the same split (f32 compute, so tight)
    bundle = build_dataset("ibtt", cfg["dataset"], 0)
    va = bundle.splits["val"]
    direct = p.model.apply(p.variables, va["ids"], va["mask"],
                           q_token_id=bundle.q_token_id, deterministic=True)
    np.testing.assert_allclose(got["logits"], np.asarray(direct),
                               rtol=1e-4, atol=1e-4)

    # request-batching invariance: chunked requests == one request
    chunks = [p.predict_texts(texts[i:i + 3])["pred"]
              for i in range(0, len(texts), 3)]
    assert np.array_equal(got["pred"], np.concatenate(chunks))


def test_warmup_precompiles_buckets(tmp_path):
    """Predictor.warmup (r5): compiles the requested power-of-two buckets
    into the jit cache so the first real request at those shapes hits the
    cache; requested sizes round up to the served pow2 grid; predictions
    after warmup equal predictions without it."""
    root, out, _ = _trained(tmp_path, "ibtt")
    cold = Predictor.from_checkpoint(f"{out}/best_r")
    ex = load_examples_multi_algorithm(root, "cycle_check", ["ba"], "val",
                                       **LOAD_KW)
    texts = [e["text"] for e in ex]
    baseline = cold.predict_texts(texts)["pred"]

    p = Predictor.from_checkpoint(f"{out}/best_r")
    timings = p.warmup([1, 3, 8])          # 3 rounds up to 4
    assert sorted(timings) == [1, 4, 8]
    assert all(t >= 0 for t in timings.values())
    n_compiled = len(p._jit_cache)
    assert n_compiled == 3
    # a request inside the warmed grid adds no new compile cache entries
    got = p.predict_texts(texts[:3])       # pads to bucket 4
    assert len(p._jit_cache) == n_compiled
    assert np.array_equal(got["pred"], baseline[:3])

    # default grid = all powers of two up to max_batch
    q = Predictor.from_checkpoint(f"{out}/best_r", max_batch=8)
    assert sorted(q.warmup()) == [1, 2, 4, 8]


def test_warmup_graph_families(tmp_path):
    """warmup builds proto rows through the real graph/trail encoders."""
    for name in ("mpnn", "agtt"):
        _, out, _ = _trained(tmp_path, name)
        p = Predictor.from_checkpoint(f"{out}/best_r")
        timings = p.warmup([2])
        assert list(timings) == [2] and len(p._jit_cache) == 1


def test_serve_mpnn_graphs(tmp_path):
    root, out, cfg = _trained(tmp_path, "mpnn")
    p = Predictor.from_checkpoint(f"{out}/best_r")
    graphs = load_graphs_multi_algorithm(root, "cycle_check", ["ba"], "val",
                                         **LOAD_KW)
    got = p.predict_graphs(graphs)
    assert got["pred"].shape == (len(graphs),)

    bundle = build_dataset("mpnn", cfg["dataset"], 0)
    va = bundle.splits["val"]
    direct = p.model.apply(p.variables, va["node_feat"],
                           va["adj"].astype(np.float32), va["mask"],
                           deterministic=True)
    np.testing.assert_allclose(got["logits"], np.asarray(direct),
                               rtol=1e-4, atol=1e-4)
    chunks = [p.predict_graphs(graphs[i:i + 3])["pred"]
              for i in range(0, len(graphs), 3)]
    assert np.array_equal(got["pred"], np.concatenate(chunks))


def test_serve_agtt_graphs(tmp_path):
    root, out, cfg = _trained(tmp_path, "agtt")
    p = Predictor.from_checkpoint(f"{out}/best_r")
    graphs = load_graphs_multi_algorithm(root, "cycle_check", ["ba"], "val",
                                         **LOAD_KW)
    got = p.predict_graphs(graphs)
    assert got["pred"].shape == (len(graphs),)

    # serving re-tokenizes through the same deterministic SENT walk the
    # training bundle used, so logits must agree with the eval forward
    bundle = build_dataset("agtt", cfg["dataset"], 0)
    va = bundle.splits["val"]
    direct = p.model.apply(p.variables, va["ids"], va["mask"],
                           q_token_id=bundle.q_token_id, deterministic=True)
    np.testing.assert_allclose(got["logits"], np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


def test_serve_rejects_oversized_graphs(tmp_path):
    root, out, _ = _trained(tmp_path, "mpnn")
    p = Predictor.from_checkpoint(f"{out}/best_r")
    n_max = int(p.serve["meta"]["n_max"])
    from glearning_benchmark_tpu.data.graphs import Graph
    big = Graph(edges=np.array([[0, n_max]], dtype=np.int32),
                num_nodes=n_max + 1, y=0)
    with pytest.raises(ValueError, match="exceeds"):
        p.predict_graphs([big])


def test_predict_records_routes_by_model(tmp_path):
    root, out, _ = _trained(tmp_path, "mpnn")
    p = Predictor.from_checkpoint(f"{out}/best_r")
    ex = load_examples_multi_algorithm(root, "cycle_check", ["ba"], "val",
                                       **LOAD_KW)[:5]
    got = predict_records(p, ex)
    assert got["pred"].shape == (5,)


def test_predict_cli(tmp_path, monkeypatch, capsys):
    root, out, _ = _trained(tmp_path, "ibtt")
    ex = load_examples_multi_algorithm(root, "cycle_check", ["ba"], "val",
                                       **LOAD_KW)[:6]
    inp = tmp_path / "records.jsonl"
    with open(inp, "w") as f:
        for e in ex:
            f.write(json.dumps({"text": e["text"], "label": e["label"]}) + "\n")
    outp = tmp_path / "preds.jsonl"

    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "predict_cli", os.path.join(os.path.dirname(__file__), "..", "predict.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr("sys.argv", ["predict.py", "--checkpoint",
                                     f"{out}/best_r", "--input", str(inp),
                                     "--output", str(outp)])
    mod.main()
    lines = [json.loads(l) for l in open(outp)]
    assert len(lines) == 6
    assert all({"index", "pred", "label", "prob"} <= set(l) for l in lines)
