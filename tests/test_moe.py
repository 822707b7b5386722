"""Switch MoE FFN (models/moe.py) + expert parallelism: E=1 reduces
bit-exactly to the dense FFN, routing respects capacity and validity,
the aux loss is balanced-=-1, the EP sharding rule places expert stacks
on 'expert', and the production trainer converges on a (data x expert)
mesh."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glearning_benchmark_tpu.models.moe import SwitchFFN
from glearning_benchmark_tpu.models.transformer import SimpleTransformer
from glearning_benchmark_tpu.parallel import make_mesh, shard_params
from glearning_benchmark_tpu.train.trainer import train


def _model(moe):
    return SimpleTransformer(vocab_size=100, d_model=16, nhead=4, nlayers=2,
                             d_ff=64, p_drop=0.1, max_pos=64, num_classes=2,
                             use_query_nodes=False, task="cycle_check",
                             bos_id=1, compute_dtype="float32",
                             moe_experts=moe)


def _inputs(B=8, L=32, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(7, 100, size=(B, L)).astype(np.int32)
    ids[:, 0] = 1
    mask = np.arange(L)[None] < rng.integers(24, L + 1, size=(B, 1))
    return ids, mask


def test_single_expert_is_dense_ffn():
    """E=1 with grafted dense weights: softmax over one logit is exactly
    1.0, capacity covers every token, so the MoE layer IS the dense FFN."""
    ids, mask = _inputs()
    dense, moe1 = _model(0), _model(1)
    pd = dense.init(jax.random.PRNGKey(0), ids, mask,
                    deterministic=True)["params"]
    pm = dict(moe1.init(jax.random.PRNGKey(0), ids, mask,
                        deterministic=True)["params"])
    for i in range(2):
        lay = dict(pm[f"layer_{i}"])
        lay["moe"] = dict(lay["moe"],
                          w1=pd[f"layer_{i}"]["ff1"]["kernel"][None],
                          b1=pd[f"layer_{i}"]["ff1"]["bias"][None],
                          w2=pd[f"layer_{i}"]["ff2"]["kernel"][None],
                          b2=pd[f"layer_{i}"]["ff2"]["bias"][None])
        for k in ("qkv", "out_proj", "norm1", "norm2"):
            lay[k] = pd[f"layer_{i}"][k]
        pm[f"layer_{i}"] = lay
    for k in ("embed", "pos", "norm", "cls"):
        pm[k] = pd[k]
    out_d = dense.apply({"params": pd}, ids, mask, deterministic=True)
    out_m = moe1.apply({"params": pm}, ids, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_m))


def test_capacity_and_validity():
    """Tokens beyond an expert's capacity and masked-invalid tokens get
    zero MoE output (the encoder residual carries them)."""
    ffn = SwitchFFN(d_model=8, d_ff=16, n_experts=2, capacity_factor=0.25)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8)),
                    jnp.float32)
    valid = jnp.ones((2, 8), bool)
    params = ffn.init(jax.random.PRNGKey(0), x, valid, True)["params"]
    out, state = ffn.apply({"params": params}, x, valid, True,
                           mutable=["losses"])
    # per-row capacity 0.25 * 8 / 2 = 1 slot/expert/row
    # -> at most B * E * cap = 2 * 2 * 1 = 4 routed tokens
    routed = (np.abs(np.asarray(out)).reshape(16, 8).sum(-1) > 0).sum()
    assert routed <= 4
    # an all-invalid batch routes nothing
    out0, _ = ffn.apply({"params": params}, x, jnp.zeros((2, 8), bool), True,
                        mutable=["losses"])
    np.testing.assert_array_equal(np.asarray(out0), 0.0)


def test_aux_loss_balanced_floor():
    """The Switch aux loss E * sum(f_e * p_e) is ~1 when routing is
    uniform and >= 1 in general."""
    ffn = SwitchFFN(d_model=8, d_ff=16, n_experts=4, capacity_factor=2.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16, 8)),
                    jnp.float32)
    valid = jnp.ones((4, 16), bool)
    params = ffn.init(jax.random.PRNGKey(1), x, valid, True)["params"]
    _, state = ffn.apply({"params": params}, x, valid, True,
                         mutable=["losses"])
    (aux,) = jax.tree.leaves(state["losses"])
    assert float(aux) >= 0.99  # 1.0 at perfect balance


def test_ep_shard_rule():
    """Expert stacks shard their leading axis over 'expert'; the router
    and non-MoE params stay replicated."""
    from jax.sharding import PartitionSpec as P

    ids, mask = _inputs()
    model = _model(4)
    params = model.init(jax.random.PRNGKey(0), ids, mask,
                        deterministic=True)["params"]
    mesh = make_mesh(expert_shards=2)
    sharded = shard_params(mesh, params)
    moe = sharded["layer_0"]["moe"]
    assert moe["w1"].sharding.spec == P("expert", None, None)
    assert moe["w2"].sharding.spec == P("expert", None, None)
    assert moe["b1"].sharding.spec == P("expert", None)
    assert moe["router"]["kernel"].sharding.spec == P()
    assert sharded["layer_0"]["qkv"]["kernel"].sharding.spec == P()


def _cfg(root, out, moe, expert_shards):
    return {
        "dataset": {"graph_token_root": root, "task": "cycle_check",
                    "train_algorithms": ["ba"], "test_algorithm": "sfn",
                    "use_split_tasks_dirs": True, "num_graphs": 24,
                    "max_len": 600, "max_vocab": 600,
                    "generate_num_graphs": 24, "pack": False},
        "model": {"d_model": 16, "nhead": 4, "nlayers": 2, "d_ff": 64,
                  "dropout": 0.0, "max_pos": 600,
                  "compute_dtype": "float32", "moe_experts": moe},
        "parallel": {"expert_shards": expert_shards},
        "train": {"batch_size": 8, "epochs": 2, "lr": 1e-3,
                  "weight_decay": 1e-4, "seed": 0},
        "output": {"out_dir": out, "run_name": f"moe{expert_shards}"},
        "wandb": {"use": False},
    }


def test_train_dp_vs_dpep_equivalence():
    """EP is a layout: the same MoE config trained on (8 data) vs
    (4 data x 2 expert) meshes gives the same loss trajectory up to f32
    reassociation across the dispatch collectives."""
    root = tempfile.mkdtemp()
    r_dp = train(_cfg(root, tempfile.mkdtemp(), 4, 1), "ibtt",
                 verbose=False, mesh=make_mesh())
    r_ep = train(_cfg(root, tempfile.mkdtemp(), 4, 2), "ibtt",
                 verbose=False, mesh=make_mesh(expert_shards=2))
    l_dp = [h["train/loss"] for h in r_dp.history]
    l_ep = [h["train/loss"] for h in r_ep.history]
    np.testing.assert_allclose(l_dp, l_ep, rtol=1e-3)


def test_manual_ep_matches_gspmd_path():
    """parallel.ep_manual is a communication-schedule change, not a math
    change: explicit all-to-all dispatch (models/moe.py _manual_ep_ffn)
    computes the same dispatch tensors and the same per-expert matmul rows.
    The isolated FFN block is bit-equal in deterministic f32; the full model
    differs only by XLA fusing the non-MoE ops differently around the
    shard_map (measured ~2e-8 — f32 noise, not a math difference)."""
    mesh = make_mesh(expert_shards=2)
    ffn_a = SwitchFFN(d_model=8, d_ff=16, n_experts=4, capacity_factor=1.25)
    ffn_m = ffn_a.clone(ep_mesh=mesh)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 8, 8)),
                    jnp.float32)
    valid = jnp.asarray(np.random.default_rng(3).random((8, 8)) > 0.2)
    p = ffn_a.init(jax.random.PRNGKey(0), x, valid, True)["params"]
    oa, _ = jax.jit(lambda p: ffn_a.apply(
        {"params": p}, x, valid, True, mutable=["losses"]))(p)
    om, _ = jax.jit(lambda p: ffn_m.apply(
        {"params": p}, x, valid, True, mutable=["losses"]))(p)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(om))

    ids, mask = _inputs()  # B=8 = data(4) * expert(2) * 1
    auto = _model(4)
    manual = auto.clone(ep_mesh=mesh)
    params = auto.init(jax.random.PRNGKey(0), ids, mask,
                       deterministic=True)["params"]
    out_a = jax.jit(lambda p: auto.apply({"params": p}, ids, mask,
                                         deterministic=True))(params)
    out_m = jax.jit(lambda p: manual.apply({"params": p}, ids, mask,
                                           deterministic=True))(params)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_m),
                               atol=1e-6)


def test_manual_ep_dropout_and_guards():
    """The manual path trains (its in-region dropout draws a different
    Bernoulli stream than nn.Dropout — documented contract), and refuses
    meshes/batches it cannot shard."""
    ids, mask = _inputs()
    mesh = make_mesh(expert_shards=2)
    model = _model(4).clone(ep_mesh=mesh, p_drop=0.2)
    params = model.init(jax.random.PRNGKey(0), ids, mask,
                        deterministic=True)["params"]
    out, state = model.apply({"params": params}, ids, mask,
                             deterministic=False, mutable=["losses"],
                             rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out)).all()
    # batch must divide over data*expert
    bad_ids, bad_mask = _inputs(B=6)
    with pytest.raises(ValueError, match="divide"):
        model.apply({"params": params}, bad_ids[:6], bad_mask[:6],
                    deterministic=True)


def test_train_dp_vs_manual_ep_equivalence():
    """The production trainer under parallel.ep_manual matches the pure-DP
    trajectory (same tolerance as the GSPMD-EP equivalence test)."""
    root = tempfile.mkdtemp()
    cfg = _cfg(root, tempfile.mkdtemp(), 4, 2)
    cfg["parallel"]["ep_manual"] = True
    r_dp = train(_cfg(root, tempfile.mkdtemp(), 4, 1), "ibtt",
                 verbose=False, mesh=make_mesh())
    r_ep = train(cfg, "ibtt", verbose=False, mesh=make_mesh(expert_shards=2))
    l_dp = [h["train/loss"] for h in r_dp.history]
    l_ep = [h["train/loss"] for h in r_ep.history]
    np.testing.assert_allclose(l_dp, l_ep, rtol=1e-3)
    # ep_manual without an expert axis is a config error
    cfg_bad = _cfg(root, tempfile.mkdtemp(), 4, 1)
    cfg_bad["parallel"]["ep_manual"] = True
    with pytest.raises(ValueError, match="expert_shards"):
        train(cfg_bad, "ibtt", verbose=False, mesh=make_mesh())


def test_expert_shards_requires_moe():
    with pytest.raises(ValueError, match="moe_experts"):
        train(_cfg(tempfile.mkdtemp(), tempfile.mkdtemp(), 0, 2), "ibtt",
              verbose=False, mesh=make_mesh(expert_shards=2))
    # experts must divide over the expert axis, else the stacks silently
    # stay replicated while the mesh gives up data-parallel width
    with pytest.raises(ValueError, match="divide"):
        train(_cfg(tempfile.mkdtemp(), tempfile.mkdtemp(), 3, 2), "ibtt",
              verbose=False, mesh=make_mesh(expert_shards=2))
    # graph-native models have no MoE FFN
    with pytest.raises(ValueError, match="token"):
        train(_cfg(tempfile.mkdtemp(), tempfile.mkdtemp(), 4, 2), "mpnn",
              verbose=False, mesh=make_mesh(expert_shards=2))
