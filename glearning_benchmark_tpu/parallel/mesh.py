"""Device mesh and sharding helpers.

The reference is strictly single-device (SURVEY §2.2: no torch.distributed,
no DDP, nothing). This module is the new first-class parallel layer: a
``('data', 'model')`` mesh over whatever devices exist; batches shard over
'data' (DP), parameters stay replicated at this model scale ('model' is
reserved for TP of larger models). Gradient all-reduce, metric psum and
vocab-count psum all compile onto ICI within a slice / DCN across hosts via
GSPMD — no explicit collectives in user code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              data_axis: Optional[int] = None,
              model_axis: int = 1,
              seq_shards: int = 1,
              pipe_stages: int = 1,
              expert_shards: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh — plus a trailing 'seq' axis when
    ``seq_shards`` > 1 (sequence-parallel ring attention,
    ops/ring_attention.py), a 'pipe' axis when ``pipe_stages`` > 1
    (GPipe stage pipeline, parallel/pipeline.py), or an 'expert' axis
    when ``expert_shards`` > 1 (Switch MoE expert parallelism,
    models/moe.py). Defaults: all devices on 'data'."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    exclusive = [x for x in (("pipe_stages", pipe_stages),
                             ("expert_shards", expert_shards)) if x[1] > 1]
    if exclusive and (model_axis > 1 or seq_shards > 1 or len(exclusive) > 1):
        raise ValueError(f"{exclusive[0][0]} composes with DP only "
                         "(no TP/SP/other axes on the same mesh yet)")
    if data_axis is None:
        data_axis = n // (model_axis * seq_shards * pipe_stages
                          * expert_shards)
    if pipe_stages > 1:
        arr = np.array(devs).reshape(data_axis, pipe_stages)
        return Mesh(arr, axis_names=("data", "pipe"))
    if expert_shards > 1:
        arr = np.array(devs).reshape(data_axis, expert_shards)
        return Mesh(arr, axis_names=("data", "expert"))
    if seq_shards > 1:
        arr = np.array(devs).reshape(data_axis, model_axis, seq_shards)
        return Mesh(arr, axis_names=("data", "model", "seq"))
    arr = np.array(devs).reshape(data_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch_spec(mesh: Mesh, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """NamedSharding placing ``batch_dim`` on 'data', all else replicated."""
    spec = [None] * ndim
    spec[batch_dim] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shard_spec(mesh: Mesh, path, leaf) -> NamedSharding:
    """Tensor-parallel sharding rule for one parameter leaf.

    Embedding tables and Dense kernels shard their feature (last) axis over
    'model'; everything else (biases, LayerNorm scales, eps scalars) is
    replicated. The rule matches the dryrun contract (__graft_entry__.py)
    and only shards when the feature dim divides the 'model' axis so GSPMD
    never sees a ragged split.
    """
    shape = dict(mesh.shape)
    tp = shape.get("model", 1)  # ('data','pipe'/'expert') meshes: no TP axis
    ep = shape.get("expert", 1)
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    # Switch MoE expert stacks (models/moe.py: w1/w2/b1/b2 with a leading
    # expert axis under a 'moe' module) shard that axis over 'expert' —
    # GSPMD partitions the batched expert matmuls and inserts the
    # dispatch/combine collectives. The router stays replicated.
    if (ep > 1 and "moe" in names and names[-1] in ("w1", "w2", "b1", "b2")
            and leaf.shape[0] % ep == 0):
        return NamedSharding(mesh, P(*(["expert"] + [None] * (leaf.ndim - 1))))
    if (tp > 1 and leaf.ndim >= 2
            and ("embedding" in names or "kernel" in names)
            and leaf.shape[-1] % tp == 0):
        return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["model"])))
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """device_put a parameter tree with the TP rule above."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(x, param_shard_spec(mesh, p, x)), params)
