"""Sequence packing (SURVEY §7 stage 2d): structural invariants of
pack_examples, per-example equivalence of the packed forward vs the
unpacked forward, and end-to-end packed training for ibtt/agtt."""

import jax
import numpy as np
import pytest

from glearning_benchmark_tpu.models import SimpleTransformer
from glearning_benchmark_tpu.tokenization.pack import pack_examples
from glearning_benchmark_tpu.train.trainer import train

from test_trainer import _config, corpus_root  # noqa: F401  (fixture)


def _random_seqs(rng, n, bos=1, q_id=None, lo=5, hi=40, vocab=50):
    seqs = []
    for _ in range(n):
        m = int(rng.integers(lo, hi))
        s = rng.integers(5, vocab, size=m).astype(np.int32)
        s[0] = bos
        if q_id is not None and m >= 6:
            s[m - 4] = q_id  # '<q> x u v' tail like the ibtt grammar
        seqs.append(s)
    return seqs


def test_pack_examples_invariants():
    rng = np.random.default_rng(0)
    q_id = 4
    seqs = _random_seqs(rng, 37, q_id=q_id)
    bucket = 64
    pk = pack_examples(seqs, bucket=bucket, pad_id=0, q_token_id=q_id,
                       query_offsets=(2, 3))
    ids, seg, pos = pk["ids"], pk["seg"], pk["pos"]
    # every example appears exactly once
    flat = sorted(e for row in pk["ex_of_row"] for e in row)
    assert flat == list(range(len(seqs)))
    assert pk["ex_valid"].sum() == len(seqs)
    # rows reconstruct the original sequences exactly
    for r, members in enumerate(pk["ex_of_row"]):
        for k, e in enumerate(members):
            sel = seg[r] == k + 1
            got = ids[r][sel]
            np.testing.assert_array_equal(got, seqs[e][:bucket])
            # within-segment positions restart at 0 and are contiguous
            np.testing.assert_array_equal(pos[r][sel], np.arange(sel.sum()))
            # readout slots: bos at segment start, query at q_pos+offsets
            assert pk["pos_bos"][r, k] == np.flatnonzero(sel)[0]
            hits = np.flatnonzero(seqs[e][:bucket] == q_id)
            if hits.size and hits[0] + 3 < min(len(seqs[e]), bucket):
                off = np.flatnonzero(sel)[0]
                assert ids[r][pk["pos_u"][r, k]] == seqs[e][hits[0] + 2]
                assert ids[r][pk["pos_v"][r, k]] == seqs[e][hits[0] + 3]
                assert pk["pos_u"][r, k] == off + hits[0] + 2
    # padding tokens have seg 0
    assert ((ids == 0) | (seg > 0)).all() or (seg[ids != 0] > 0).all()
    # packing actually packs (mean length << bucket here)
    assert len(pk["ex_of_row"]) < len(seqs)


def test_pack_truncates_overlong():
    seqs = [np.arange(1, 100, dtype=np.int32)]  # longer than bucket
    pk = pack_examples(seqs, bucket=32, pad_id=0)
    assert (pk["seg"][0] == 1).sum() == 32
    np.testing.assert_array_equal(pk["ids"][0], np.arange(1, 33))


def test_packed_forward_matches_unpacked():
    """The load-bearing equivalence: per-example logits from a packed row
    (block-diagonal mask, segment-relative positions, precomputed readout)
    must match the unpacked forward with the same parameters."""
    rng = np.random.default_rng(1)
    q_id = 4
    model = SimpleTransformer(vocab_size=50, d_model=16, nhead=4, nlayers=2,
                              d_ff=32, max_pos=128, num_classes=7,
                              use_query_nodes=True, query_offsets=(2, 3),
                              compute_dtype="float32")
    seqs = _random_seqs(rng, 13, q_id=q_id, lo=8, hi=30)
    bucket = 64
    pk = pack_examples(seqs, bucket=bucket, pad_id=0, q_token_id=q_id,
                       query_offsets=(2, 3))

    # unpacked reference: one row per example
    n = len(seqs)
    ids_u = np.zeros((n, bucket), dtype=np.int32)
    mask_u = np.zeros((n, bucket), dtype=bool)
    for i, s in enumerate(seqs):
        ids_u[i, : len(s)] = s
        mask_u[i, : len(s)] = True

    params = model.init(jax.random.PRNGKey(0), ids_u, mask_u,
                        q_token_id=q_id, deterministic=True)["params"]
    out_u = np.asarray(model.apply({"params": params}, ids_u, mask_u,
                                   q_token_id=q_id, deterministic=True))
    out_p = np.asarray(model.apply(
        {"params": params}, pk["ids"], pk["seg"] > 0, q_token_id=q_id,
        deterministic=True, seg=pk["seg"], pos=pk["pos"],
        pos_bos=pk["pos_bos"], pos_u=pk["pos_u"], pos_v=pk["pos_v"]))

    for r, members in enumerate(pk["ex_of_row"]):
        for k, e in enumerate(members):
            np.testing.assert_allclose(out_p[r, k], out_u[e],
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"example {e} (row {r} slot {k})")


@pytest.mark.parametrize("model_name", ["ibtt", "agtt"])
def test_train_packed_end_to_end(model_name, corpus_root, tmp_path):  # noqa: F811
    cfg = _config(corpus_root, str(tmp_path), task="shortest_path",
                  num_pairs_per_graph=5, pack=True)
    res = train(cfg, model_name, verbose=False)
    assert res.history[-1]["train/loss"] < res.history[0]["train/loss"]
    assert 0.0 <= res.best_val <= 1.0
    # eval path stays unpacked and produces the reference schema
    assert "accuracy" in res.test_metrics


def test_packed_training_learns(corpus_root, tmp_path):  # noqa: F811
    """Packed training learns the task (batch composition differs from the
    unpacked path — row co-location is static — so the comparison is an
    absolute learning threshold, not bit-parity; per-example forward parity
    is covered by test_packed_forward_matches_unpacked)."""
    cfg_p = _config(corpus_root, str(tmp_path / "p"), epochs=10, pack=True)
    res_p = train(cfg_p, "ibtt", verbose=False)
    assert res_p.best_val >= 0.7
    assert res_p.history[-1]["train/loss"] < res_p.history[0]["train/loss"]


def test_packed_flash_forward_matches_xla_path():
    """use_flash on packed rows (block-diagonal segment mask inside the
    Pallas kernel, interpret mode) matches the XLA packed forward."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    q_id = 4
    kw = dict(vocab_size=50, d_model=16, nhead=4, nlayers=2, d_ff=32,
              max_pos=128, num_classes=7, use_query_nodes=True,
              query_offsets=(2, 3), compute_dtype="float32")
    model_xla = SimpleTransformer(**kw)
    model_fl = SimpleTransformer(use_flash=True, **kw)
    seqs = _random_seqs(rng, 9, q_id=q_id, lo=8, hi=30)
    pk = pack_examples(seqs, bucket=64, pad_id=0, q_token_id=q_id,
                       query_offsets=(2, 3))
    args = dict(q_token_id=q_id, deterministic=True, seg=pk["seg"],
                pos=pk["pos"], pos_bos=pk["pos_bos"], pos_u=pk["pos_u"],
                pos_v=pk["pos_v"])
    params = model_xla.init(jax.random.PRNGKey(0), pk["ids"], pk["seg"] > 0,
                            **args)["params"]
    out_x = np.asarray(model_xla.apply({"params": params}, pk["ids"],
                                       pk["seg"] > 0, **args))
    with pltpu.force_tpu_interpret_mode():
        out_f = np.asarray(model_fl.apply({"params": params}, pk["ids"],
                                          pk["seg"] > 0, **args))
    np.testing.assert_allclose(out_f, out_x, atol=2e-5, rtol=1e-4)


def test_packed_zinc_forward_matches_unpacked(tmp_path):
    """ZINC regression rows: the packed forward must equal the unpacked
    forward per example. Guards the bos-id contract — the fixed ZINC vocab
    pins '<bos>' at 0 (SPECIAL has it at 1); a wrong model bos_id silently
    flips the unpacked path to masked-mean pooling while the packed path
    reads the true segment start, diverging train from eval."""
    from glearning_benchmark_tpu.train.datasets import build_ibtt_dataset
    from glearning_benchmark_tpu.train.trainer import build_model

    cfg = {"dataset": {"task": "zinc", "zinc_root": str(tmp_path / "ZINC"),
                       "subset": True, "max_len": 1024, "pack": True},
           "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                     "use_flash": False, "compute_dtype": "float32",
                     "max_pos": 1024}}
    b = build_ibtt_dataset(cfg["dataset"], seed=0, limit=200)
    model = build_model("ibtt", cfg, b)
    assert model.bos_id == b.vocab["<bos>"] == 0
    tr = b.splits["train"]
    ids, seg = tr["ids"][:8], tr["seg"][:8]
    args = dict(q_token_id=b.q_token_id, deterministic=True, seg=seg,
                pos=tr["pos"][:8], pos_bos=tr["pos_bos"][:8],
                pos_u=tr["pos_u"][:8], pos_v=tr["pos_v"][:8])
    params = model.init(jax.random.PRNGKey(0), ids, seg > 0, **args)["params"]
    out_p = np.asarray(model.apply({"params": params}, ids, seg > 0, **args))

    L = ids.shape[1]
    rows = []
    for r in range(ids.shape[0]):
        for s in range(tr["y"].shape[1]):
            if not tr["ex_valid"][r, s]:
                continue
            tok = ids[r][seg[r] == s + 1]
            row = np.full(L, b.meta["pad_id"], np.int32)
            row[: len(tok)] = tok
            m = np.zeros(L, bool)
            m[: len(tok)] = True
            rows.append((row, m, r, s))
    ids_u = np.stack([x[0] for x in rows])
    mask_u = np.stack([x[1] for x in rows])
    out_u = np.asarray(model.apply({"params": params}, ids_u, mask_u,
                                   q_token_id=b.q_token_id,
                                   deterministic=True))
    for i, (_, _, r, s) in enumerate(rows):
        np.testing.assert_allclose(out_p[r, s], out_u[i], atol=2e-5,
                                   err_msg=f"row {r} slot {s}")
