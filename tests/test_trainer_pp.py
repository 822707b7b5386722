"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over a
'pipe' mesh axis is a schedule change, not a math change — forwards and
gradients match the plain stack, and the production trainer converges on a
(data x pipe) mesh with the same trajectory as pure DP."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glearning_benchmark_tpu.models.transformer import SimpleTransformer
from glearning_benchmark_tpu.parallel import make_mesh, pp_transformer_forward
from glearning_benchmark_tpu.train.trainer import train


def _model(nlayers=4, task="shortest_path"):
    return SimpleTransformer(
        vocab_size=100, d_model=16, nhead=4, nlayers=nlayers, d_ff=64,
        p_drop=0.1, max_pos=64, num_classes=7,
        use_query_nodes=task == "shortest_path", task=task,
        bos_id=1, query_offsets=(2, 3), compute_dtype="float32")


def _inputs(B=16, L=48, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(7, 100, size=(B, L)).astype(np.int32)
    ids[:, 0] = 1
    ids[np.arange(B), rng.integers(5, 40, size=B)] = 3  # '<q>'
    mask = np.arange(L)[None] < rng.integers(44, L + 1, size=(B, 1))
    y = rng.integers(0, 7, size=B)
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(y)


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 4), (2, 4), (4, 2)])
def test_pp_forward_matches_plain(stages, n_micro):
    model = _model()
    ids, mask, _ = _inputs()
    params = model.init(jax.random.PRNGKey(0), ids, mask, q_token_id=3,
                        deterministic=True)["params"]
    ref = model.apply({"params": params}, ids, mask, q_token_id=3,
                      deterministic=True)
    mesh = make_mesh(pipe_stages=stages)
    out = jax.jit(lambda p, i, m: pp_transformer_forward(
        mesh, model, p, i, m, q_token_id=3, deterministic=True,
        n_micro=n_micro))(params, ids, mask)
    # psum + scan reassociate float adds; logits agree to float32 noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_grads_match_plain():
    model = _model()
    ids, mask, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), ids, mask, q_token_id=3,
                        deterministic=True)["params"]
    mesh = make_mesh(pipe_stages=4)

    def loss_ref(p):
        lg = model.apply({"params": p}, ids, mask, q_token_id=3,
                         deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

    def loss_pp(p):
        lg = pp_transformer_forward(mesh, model, p, ids, mask, q_token_id=3,
                                    deterministic=True, n_micro=4)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g_ref, g_pp)


def test_pp_packed_rows_match_plain():
    """Packed rows (seg + per-slot readout) through the pipeline: the
    segment mask and slot gathers ride along unchanged."""
    from glearning_benchmark_tpu.tokenization.pack import pack_examples

    model = _model(task="cycle_check")
    rng = np.random.default_rng(1)
    seqs = [np.concatenate([[1], rng.integers(7, 100,
                                              size=rng.integers(8, 30))])
            .astype(np.int32) for _ in range(24)]
    pk = pack_examples(seqs, bucket=48, pad_id=0)
    n = pk["ids"].shape[0] - pk["ids"].shape[0] % 4
    n = max(n, 4)
    def rep(a):
        reps = -(-n // a.shape[0])
        return jnp.asarray(np.concatenate([a] * reps, 0)[:n])
    b = {k: rep(pk[k]) for k in ("ids", "seg", "pos", "pos_bos",
                                 "pos_u", "pos_v")}
    params = model.init(jax.random.PRNGKey(0), b["ids"], b["seg"] > 0,
                        deterministic=True, seg=b["seg"], pos=b["pos"],
                        pos_bos=b["pos_bos"], pos_u=b["pos_u"],
                        pos_v=b["pos_v"])["params"]
    ref = model.apply({"params": params}, b["ids"], b["seg"] > 0,
                      deterministic=True, seg=b["seg"], pos=b["pos"],
                      pos_bos=b["pos_bos"], pos_u=b["pos_u"],
                      pos_v=b["pos_v"])
    mesh = make_mesh(pipe_stages=2)
    out = jax.jit(lambda p: pp_transformer_forward(
        mesh, model, p, b["ids"], b["seg"] > 0, deterministic=True,
        n_micro=2, seg=b["seg"], pos=b["pos"], pos_bos=b["pos_bos"],
        pos_u=b["pos_u"], pos_v=b["pos_v"]))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_remat_matches_plain():
    """remat=True (the long-sequence default) wraps the pipeline's layer fn
    in jax.checkpoint; values and grads are unchanged."""
    model = _model().clone(remat=True)
    ids, mask, y = _inputs()
    params = model.init(jax.random.PRNGKey(0), ids, mask, q_token_id=3,
                        deterministic=True)["params"]
    mesh = make_mesh(pipe_stages=2)
    ref = model.apply({"params": params}, ids, mask, q_token_id=3,
                      deterministic=True)
    out = jax.jit(lambda p: pp_transformer_forward(
        mesh, model, p, ids, mask, q_token_id=3, deterministic=True,
        n_micro=2))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def loss_pp(p):
        lg = pp_transformer_forward(mesh, model, p, ids, mask, q_token_id=3,
                                    deterministic=True, n_micro=2)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

    g = jax.jit(jax.grad(loss_pp))(params)  # remat backward compiles + runs
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_pp_rejects_indivisible():
    model = _model(nlayers=3)
    ids, mask, _ = _inputs()
    params = model.init(jax.random.PRNGKey(0), ids, mask, q_token_id=3,
                        deterministic=True)["params"]
    mesh = make_mesh(pipe_stages=2)
    with pytest.raises(ValueError, match="nlayers"):
        pp_transformer_forward(mesh, model, params, ids, mask,
                               q_token_id=3, deterministic=True)
    model4 = _model(nlayers=4)
    params4 = model4.init(jax.random.PRNGKey(0), ids, mask, q_token_id=3,
                          deterministic=True)["params"]
    with pytest.raises(ValueError, match="divisible"):
        pp_transformer_forward(mesh, model4, params4, ids, mask,
                               q_token_id=3, deterministic=True, n_micro=5)


def _train_cfg(root, out, pipe_stages):
    return {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 24,
                    "max_len": 600, "max_vocab": 600,
                    "generate_num_graphs": 24, "pack": False},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                  "dropout": 0.0, "max_pos": 600,
                  "compute_dtype": "float32"},
        "parallel": {"pipe_stages": pipe_stages},
        "train": {"batch_size": 8, "epochs": 2, "lr": 1e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": out, "run_name": f"pp{pipe_stages}"},
        "wandb": {"use": False},
    }


def test_train_dp_vs_dppp_equivalence():
    """PP is a schedule, not a math change: same seed/config on (8 data)
    vs (4 data x 2 pipe) meshes gives the same loss trajectory up to f32
    reassociation across the pipeline collectives."""
    root = tempfile.mkdtemp()
    r_dp = train(_train_cfg(root, tempfile.mkdtemp(), 1), "ibtt",
                 verbose=False, mesh=make_mesh())
    r_pp = train(_train_cfg(root, tempfile.mkdtemp(), 2), "ibtt",
                 verbose=False, mesh=make_mesh(pipe_stages=2))
    l_dp = [h["train/loss"] for h in r_dp.history]
    l_pp = [h["train/loss"] for h in r_pp.history]
    np.testing.assert_allclose(l_dp, l_pp, rtol=1e-3)
    assert r_pp.history[-1]["train/loss"] < r_pp.history[0]["train/loss"]
