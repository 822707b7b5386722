"""The unified training engine (one engine, not four trainers).

The reference duplicates a near-identical epoch loop across four trainer
modules (trainer/train_{ibtt,agtt,mpnn,ggps}.py — SURVEY §2.7). Here one
``train(config)`` drives all model families through task adapters.

TPU-first structure:
- datasets are assembled ONCE into fixed-shape arrays (train/datasets.py)
  and moved to device once;
- a whole epoch is a single jitted ``lax.scan`` over minibatch index
  gathers — one dispatch per epoch instead of one per batch, no host sync
  until the epoch's summed metric statistics come back;
- metrics are device-side sufficient statistics (loss sums, confusion
  matrices, error sums) reduced exactly; host-side formulas in
  train/metrics.py produce the reference's logging schema;
- under a multi-device mesh the batch axis is sharded over 'data' and XLA
  inserts the gradient/metric all-reduces (parallel/mesh.py).

Observable behavior kept from the reference: AdamW + global-norm clip 1.0
(train_ibtt.py:149,434), task loss table (metrics.py:185-206: zinc->L1,
else CE), best-checkpoint selection (max val acc / min val MAE) with reload
before the OOD test pass (train_ibtt.py:557-582), per-epoch stdout lines and
the W&B-schema log dict (train/loss, val/acc, throughput/graphs_per_sec,
time/epoch_duration, memory/device_mb, ...), cosine-with-warmup for GPS
(configs/gps_graph_token.yaml:63-69).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gps import GPSModel
from ..models.mpnn import MPNN
from ..models.transformer import SimpleTransformer
from ..parallel.mesh import make_mesh
from ..tokenization.vocab import SPECIAL
from .checkpoint import load_checkpoint, save_checkpoint, serving_meta
from .datasets import (
    QUERY_OFFSETS,
    QUERY_TASKS,
    DatasetBundle,
    build_agtt_dataset,
    build_graph_dataset,
    build_ibtt_dataset,
)
from .metrics import classification_metrics_from_cm, format_confusion_matrix, regression_metrics_from_sums


@dataclass
class TrainResult:
    best_val: float
    test_metrics: Dict[str, Any]
    history: List[Dict[str, Any]]
    params: Any = None
    bundle: Optional[DatasetBundle] = None


# ---------------------------------------------------------------------------
# model construction
# ---------------------------------------------------------------------------

# QUERY_TASKS is the shared table in datasets.py (imported above)


def build_model(model_name: str, config: dict, bundle: DatasetBundle,
                sp_mesh=None, ep_mesh=None):
    model_cfg = config.get("model", {})
    task = bundle.task
    use_query = task in QUERY_TASKS
    if model_name in ("ibtt", "agtt"):
        if model_name == "ibtt":
            # from the dataset's vocab, NOT the synthetic SPECIAL table: the
            # fixed ZINC vocab pins '<bos>' at 0 (SPECIAL has it at 1), and a
            # wrong id silently flips the unpacked forward to the masked-mean
            # fallback while the packed readout pools the true segment start
            # — a train(packed)/eval(unpacked) readout mismatch that made
            # packed ibtt-zinc val diverge (reference pooling contract:
            # train_ibtt.py:114-120, '<bos>' state when position 0 is <bos>)
            bos_id = (bundle.vocab or {}).get("<bos>", SPECIAL.index("<bos>"))
            # per-task '<q>' operand positions — one shared table
            # (datasets.QUERY_OFFSETS) also drives the packed-row readout
            offsets = QUERY_OFFSETS.get(task, (1, 2))
        else:
            bos_id = bundle.meta.get("bos_id", 0)
            offsets = (1, 2)  # trail-appended '<q> u v'
        seq_len = bundle.meta.get("max_len", 0)
        return SimpleTransformer(
            vocab_size=bundle.vocab_size,
            d_model=int(model_cfg.get("d_model", 32)),
            nhead=int(model_cfg.get("nhead", 4)),
            nlayers=int(model_cfg.get("nlayers", 4)),
            d_ff=int(model_cfg.get("d_ff", 128)),
            p_drop=float(model_cfg.get("dropout", 0.1)),
            max_pos=max(int(model_cfg.get("max_pos", 600)), seq_len),
            num_classes=bundle.num_classes,
            use_query_nodes=use_query,
            task=task,
            bos_id=bos_id,
            query_offsets=offsets,
            # remat encoder layers at long sequence lengths: the [B,H,L,L]
            # attention probabilities dominate HBM in the backward pass
            remat=bool(model_cfg.get("remat", seq_len >= 1024)),
            # Pallas flash attention (custom VJP, head-packed lane layout —
            # H heads x small D packed into the 128-lane minor dim, no
            # D->128 HBM padding): measured 1.05-1.4x faster than XLA
            # fwd+bwd at all benchmark shapes (FLASH_AB.json). Defaulted on
            # in the L=1024 ZINC configs; the synthetic configs keep XLA
            # attention (≈5% of epoch) for attention-prob dropout parity.
            # platform gate: Pallas kernels only lower on TPU — on CPU/GPU
            # backends (tests, smokes) fall back to the bit-equivalent XLA
            # attention instead of failing to compile
            use_flash=bool(model_cfg.get("use_flash", False))
            and jax.default_backend() == "tpu",
            compute_dtype=model_cfg.get("compute_dtype", "bfloat16"),
            # sequence-parallel ring attention over the mesh's 'seq' axis
            # (parallel.seq_shards > 1); flash and SP are mutually
            # exclusive attention implementations — SP wins when both set
            sp_mesh=sp_mesh,
            # Switch MoE FFN (models/moe.py), EP-shardable via
            # parallel.expert_shards — pure scale-out headroom, the
            # reference workload has no MoE (SURVEY §2.2)
            moe_experts=int(model_cfg.get("moe_experts", 0)),
            moe_capacity=float(model_cfg.get("moe_capacity", 1.25)),
            # manual all-to-all MoE dispatch (parallel.ep_manual): batch
            # shards over BOTH mesh axes and the dispatch/combine become
            # explicit lax.all_to_all exchanges (models/moe.py)
            ep_mesh=ep_mesh,
        )
    if model_name == "mpnn":
        return MPNN(
            in_dim=bundle.in_dim,
            hidden_dim=int(model_cfg.get("hidden_dim", 64)),
            num_layers=int(model_cfg.get("num_layers", 5)),
            dropout=float(model_cfg.get("dropout", 0.1)),
            pooling=model_cfg.get("pooling", "mean"),
            num_classes=bundle.num_classes,
            task=task,
            compute_dtype=model_cfg.get("compute_dtype", "bfloat16"),
            edge_features=bool(model_cfg.get("edge_features", False)),
        )
    if model_name == "ggps":
        gt = config.get("gt", {})
        return GPSModel(
            in_dim=bundle.in_dim,
            dim=int(gt.get("dim_hidden", model_cfg.get("dim_hidden", 32))),
            num_layers=int(gt.get("layers", model_cfg.get("num_layers", 4))),
            n_heads=int(gt.get("n_heads", model_cfg.get("n_heads", 4))),
            dropout=float(gt.get("dropout", 0.0)),
            attn_dropout=float(gt.get("attn_dropout", 0.1)),
            pooling=config.get("model", {}).get("graph_pooling", "mean"),
            num_classes=bundle.num_classes,
            task=task,
            compute_dtype=config.get("model", {}).get("compute_dtype", "bfloat16"),
            edge_features=bool(config.get("model", {}).get("edge_features", False)),
        )
    raise ValueError(f"unknown model {model_name!r}")


def build_dataset(model_name: str, dataset_cfg: dict, seed: int,
                  limit: Optional[int] = None) -> DatasetBundle:
    from .datasets import _cache_path, _load_bundle, _save_bundle

    cache = bool(dataset_cfg.get("cache", True))
    path = _cache_path(model_name, dataset_cfg, seed, limit) if cache else None
    if path is not None:
        cached = _load_bundle(path)
        if cached is not None:
            return cached

    if model_name == "ibtt":
        bundle = build_ibtt_dataset(dataset_cfg, seed, limit=limit)
    elif model_name == "agtt":
        bundle = build_agtt_dataset(dataset_cfg, seed, limit=limit)
    elif model_name in ("mpnn", "ggps"):
        bundle = build_graph_dataset(dataset_cfg, seed, limit=limit)
    else:
        raise ValueError(f"unknown model {model_name!r}")
    if path is not None:
        try:
            _save_bundle(path, bundle)
        except Exception:
            pass
    return bundle


# ---------------------------------------------------------------------------
# jitted epoch machinery
# ---------------------------------------------------------------------------

def _apply_model(model, variables, batch, bundle: DatasetBundle, train: bool, rng,
                 pp=None):
    """Returns (logits, new_batch_stats_or_None, aux_loss_or_None). The aux
    term is the Switch MoE load-balance loss (models/moe.py), captured from
    the 'losses' sow collection on training forwards only."""
    kwargs = {}
    if train:
        kwargs["rngs"] = {"dropout": rng}
    mutable = ["batch_stats"] if "batch_stats" in variables else []
    moe = getattr(model, "moe_experts", 0) > 0
    if moe and train:
        mutable = list(mutable) + ["losses"]
    mutable = mutable or False
    if bundle.kind == "tokens":
        if pp is not None:
            # pipeline-parallel forward (parallel/pipeline.py): same param
            # tree, GPipe schedule over the mesh's 'pipe' axis
            from ..parallel.pipeline import pp_transformer_forward
            packed = "seg" in batch
            out = pp_transformer_forward(
                pp["mesh"], model, variables["params"],
                batch["ids"], batch["seg"] > 0 if packed else batch["mask"],
                q_token_id=bundle.q_token_id, deterministic=not train,
                rng=rng if train else None, n_micro=pp["n_micro"],
                seg=batch.get("seg"), pos=batch.get("pos"),
                pos_bos=batch.get("pos_bos"), pos_u=batch.get("pos_u"),
                pos_v=batch.get("pos_v"))
            return out, None, None
        if "seg" in batch:
            # packed rows (K sequences per attention row, block-diagonal
            # mask): logits come back [B, K, C] / [B, K]
            out = model.apply(variables, batch["ids"], batch["seg"] > 0,
                              q_token_id=bundle.q_token_id,
                              deterministic=not train,
                              seg=batch["seg"], pos=batch["pos"],
                              pos_bos=batch["pos_bos"], pos_u=batch["pos_u"],
                              pos_v=batch["pos_v"], mutable=mutable, **kwargs)
        else:
            out = model.apply(variables, batch["ids"], batch["mask"],
                              q_token_id=bundle.q_token_id,
                              deterministic=not train, mutable=mutable, **kwargs)
    else:
        adj = batch["adj"].astype(jnp.float32)  # stored uint8 corpus-side
        out = model.apply(variables, batch["node_feat"], adj, batch["mask"],
                          deterministic=not train, etype=batch.get("eadj"),
                          mutable=mutable, **kwargs)
    if mutable:
        logits, updates = out
        aux = None
        if "losses" in updates:
            # sum the per-layer Switch aux terms (each sowed as a 1-tuple)
            leaves = jax.tree.leaves(updates["losses"])
            aux = sum(leaves) / max(len(leaves), 1)
        return logits, updates.get("batch_stats"), aux
    return out, None, None


def _loss_inputs(logits, batch, bvalid):
    """Flatten packed-row outputs to per-example vectors.

    Packed train batches carry labels [B, K] plus a per-slot ``ex_valid``;
    the loss/metric machinery is per-example, so flatten to [B*K] with
    validity = row-valid AND slot-valid. Unpacked batches pass through."""
    y = batch["y"]
    if y.ndim >= 2 and "ex_valid" in batch:
        valid = bvalid[:, None] & batch["ex_valid"]
        return (logits.reshape((-1,) + logits.shape[y.ndim:]),
                y.reshape(-1), valid.reshape(-1))
    return logits, y, bvalid


def _loss_and_stats(logits, y, valid, task: str, num_classes: int):
    vf = valid.astype(jnp.float32)
    count = vf.sum()
    if task == "zinc":
        err = logits - y
        loss_vec = jnp.abs(err)  # L1 (reference metrics.py:196-198)
        loss_sum = (loss_vec * vf).sum()
        stats = {
            "loss_sum": loss_sum,
            "count": count,
            "abs_sum": (jnp.abs(err) * vf).sum(),
            "sq_sum": (err ** 2 * vf).sum(),
        }
        return loss_sum / jnp.clip(count, 1.0), stats
    loss_vec = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    loss_sum = (loss_vec * vf).sum()
    preds = jnp.argmax(logits, axis=-1)
    lh = jax.nn.one_hot(y, num_classes, dtype=jnp.float32) * vf[:, None]
    ph = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)
    cm = lh.T @ ph
    stats = {"loss_sum": loss_sum, "count": count, "cm": cm}
    return loss_sum / jnp.clip(count, 1.0), stats


def make_epoch_fns(model, bundle: DatasetBundle, tx, task: str, num_classes: int,
                   pp=None, moe_aux_weight: float = 0.01):
    """Build jitted (train_block, eval_epoch) closures.

    ``train_block`` runs K epochs in ONE dispatch: an outer lax.scan over
    epochs, each an inner scan over minibatch index gathers followed by a
    val-split eval — per-epoch train/val sufficient statistics come back
    stacked [K, ...]. K=1 reproduces the classic epoch loop; larger K
    amortizes host<->device round trips (important through a tunneled chip,
    where dispatch latency dwarfs the compute of these models)."""

    def gather(arrays, idx):
        return {k: v[idx] for k, v in arrays.items() if k != "y"} | {"y": arrays["y"][idx]}

    def train_one_epoch(params, batch_stats, opt_state, arrays, idx, valid, rng):
        def step(carry, xs):
            params, batch_stats, opt_state, rng = carry
            bidx, bvalid = xs
            rng, drop = jax.random.split(rng)
            batch = gather(arrays, bidx)

            def loss_fn(p):
                variables = {"params": p}
                if batch_stats is not None:
                    variables["batch_stats"] = batch_stats
                logits, new_stats, aux = _apply_model(model, variables, batch, bundle, True, drop, pp)
                lg, y, lvalid = _loss_inputs(logits, batch, bvalid)
                loss, stats = _loss_and_stats(lg, y, lvalid, task, num_classes)
                if aux is not None:  # Switch MoE load-balance regularizer
                    loss = loss + moe_aux_weight * aux
                return loss, (stats, new_stats)

            (loss, (stats, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # gradient global-norm, carried through the scanned stats — the
            # wandb.watch(log="all") observability equivalent (reference
            # train_ibtt.py:450-453) as a per-epoch scalar
            has = (stats["count"] > 0).astype(jnp.float32)
            stats = dict(stats)
            stats["gn_sum"] = optax.global_norm(grads) * has
            stats["gn_cnt"] = has
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if batch_stats is not None and new_bs is not None:
                batch_stats = new_bs
            return (params, batch_stats, opt_state, rng), stats

        (params, batch_stats, opt_state, _), stats = jax.lax.scan(
            step, (params, batch_stats, opt_state, rng), (idx, valid))
        total = jax.tree.map(lambda s: s.sum(axis=0), stats)
        return params, batch_stats, opt_state, total

    def eval_core(params, batch_stats, arrays, idx, valid):
        def step(carry, xs):
            bidx, bvalid = xs
            batch = gather(arrays, bidx)
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            logits, _, _ = _apply_model(model, variables, batch, bundle, False, None, pp)
            lg, y, lvalid = _loss_inputs(logits, batch, bvalid)
            _, stats = _loss_and_stats(lg, y, lvalid, task, num_classes)
            return carry, stats

        _, stats = jax.lax.scan(step, None, (idx, valid))
        return jax.tree.map(lambda s: s.sum(axis=0), stats)

    def grad_probe(params, batch_stats, arrays, bidx, bvalid, rng):
        # one training batch's per-layer gradients — sampled at dispatch-block
        # boundaries for wandb.watch(log="all") gradient-histogram parity
        # (reference train_ibtt.py:450-453); never called without wandb
        batch = gather(arrays, bidx)

        def loss_fn(p):
            variables = {"params": p}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            logits, _, aux = _apply_model(model, variables, batch, bundle, True, rng, pp)
            lg, y, lvalid = _loss_inputs(logits, batch, bvalid)
            loss, _ = _loss_and_stats(lg, y, lvalid, task, num_classes)
            if aux is not None:
                loss = loss + moe_aux_weight * aux
            return loss

        return jax.grad(loss_fn)(params)

    zinc = task == "zinc"

    def _val_metric(va_stats):
        # the selection statistic, on-device (val MAE for zinc, else val acc)
        if zinc:
            return va_stats["abs_sum"] / jnp.clip(va_stats["count"], 1.0)
        return jnp.trace(va_stats["cm"]) / jnp.clip(va_stats["count"], 1.0)

    def train_block(params, batch_stats, opt_state, train_arrays, val_arrays,
                    idx_k, valid_k, vidx, vvalid, rng):
        # idx_k/valid_k: [K, nb, bs]. The best-epoch state is carried INSIDE
        # the scan (selected on-device by the val metric, strict improvement
        # keeps the first of equal epochs) so K>1 dispatch returns the exact
        # best-epoch params — no end-of-block approximation (reference
        # per-epoch selection: train_ibtt.py:557-582).
        def epoch_body(carry, xs):
            (params, batch_stats, opt_state, rng,
             b_params, b_bs, b_opt, b_metric, b_ep, ep_i) = carry
            idx, valid = xs
            rng, ep_rng = jax.random.split(rng)
            params, batch_stats, opt_state, tr_stats = train_one_epoch(
                params, batch_stats, opt_state, train_arrays, idx, valid, ep_rng)
            va_stats = eval_core(params, batch_stats, val_arrays, vidx, vvalid)
            m = _val_metric(va_stats)
            imp = (m < b_metric) if zinc else (m > b_metric)

            def sel(new, old):
                return jax.tree.map(lambda a, b: jnp.where(imp, a, b), new, old)

            b_params = sel(params, b_params)
            b_bs = sel(batch_stats, b_bs)
            b_opt = sel(opt_state, b_opt)
            b_metric = jnp.where(imp, m, b_metric)
            b_ep = jnp.where(imp, ep_i, b_ep)
            return ((params, batch_stats, opt_state, rng,
                     b_params, b_bs, b_opt, b_metric, b_ep, ep_i + 1),
                    (tr_stats, va_stats))

        init_metric = jnp.asarray(jnp.inf if zinc else -jnp.inf, jnp.float32)
        init = (params, batch_stats, opt_state, rng,
                params, batch_stats, opt_state, init_metric,
                jnp.asarray(-1, jnp.int32), jnp.asarray(0, jnp.int32))
        (params, batch_stats, opt_state, _,
         b_params, b_bs, b_opt, b_metric, b_ep, _), (tr_k, va_k) = jax.lax.scan(
            epoch_body, init, (idx_k, valid_k))
        return (params, batch_stats, opt_state, tr_k, va_k,
                b_params, b_bs, b_opt, b_metric, b_ep)

    return (jax.jit(train_block, donate_argnums=(0, 1, 2)),
            jax.jit(eval_core),
            jax.jit(grad_probe))


def make_batches(n: int, batch_size: int, rng: np.random.Generator | None,
                 pad_to_nb: int | None = None):
    """[nb, bs] index matrix + [nb, bs] validity mask (last batch padded).

    ``pad_to_nb`` pads the batch count with fully-invalid batches so
    different splits can share one compiled eval function (one XLA compile
    instead of one per distinct batch count)."""
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    nb = max(1, (n + batch_size - 1) // batch_size)
    if pad_to_nb is not None:
        nb = max(nb, pad_to_nb)
    padded = np.zeros(nb * batch_size, dtype=np.int32)
    padded[:n] = idx
    valid = np.zeros(nb * batch_size, dtype=bool)
    valid[:n] = True
    return padded.reshape(nb, batch_size), valid.reshape(nb, batch_size)


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

def _epoch_metrics(stats, task, num_classes):
    stats = jax.tree.map(np.asarray, stats)
    if task == "zinc":
        m = regression_metrics_from_sums(
            float(stats["abs_sum"]), float(stats["sq_sum"]),
            float(stats["loss_sum"]), float(stats["count"]))
    else:
        m = classification_metrics_from_cm(
            stats["cm"], task, float(stats["loss_sum"]), float(stats["count"]))
    if "gn_sum" in stats:  # mean per-step gradient global-norm (train only)
        m["grad_norm"] = float(stats["gn_sum"]) / max(float(stats["gn_cnt"]), 1.0)
    return m


def _device_memory_mb() -> float:
    try:
        ms = jax.devices()[0].memory_stats()
        return float(ms.get("bytes_in_use", 0)) / (1024 ** 2)
    except Exception:
        return 0.0


class RunLogger:
    """stdout + JSONL metrics log with the reference W&B key schema; uses
    wandb when available and enabled."""

    def __init__(self, out_dir: str, run_name: str, wandb_cfg: dict, config: dict,
                 wandb_name: Optional[str] = None):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{run_name}_metrics.jsonl")
        self._f = open(self.path, "w")  # fresh log per run (reruns/retries otherwise contaminate analysis)
        self.wandb = None
        if wandb_cfg.get("use"):
            try:
                import wandb  # noqa: PLC0415
                self.wandb = wandb
                wandb.init(project=wandb_cfg.get("project", "graph-token"),
                           name=wandb_name or run_name, config=config)
                # wandb.watch(model, log="all") equivalent (reference
                # train_ibtt.py:450-453): train/grad_norm is logged per
                # epoch from the scanned stats, and log_param_histograms
                # records per-layer weight histograms at dispatch-block
                # boundaries (torch's gradient hooks have no flax analogue)
            except Exception:
                self.wandb = None

    def log(self, d: Dict[str, Any]):
        clean = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                 for k, v in d.items()}
        self._f.write(json.dumps(clean) + "\n")
        self._f.flush()
        if self.wandb:
            self.wandb.log(d)

    def log_image(self, key: str, img, caption: str = ""):
        """W&B image (reference logs the test CM heatmap,
        train_ibtt.py:650-651); local runs already save the PNG to disk."""
        if self.wandb:
            self.wandb.log({key: self.wandb.Image(img, caption=caption)})

    def log_table(self, key: str, columns, data):
        """W&B table (reference logs the CM as a table, train_ibtt.py:653-663)."""
        if self.wandb:
            self.wandb.log({key: self.wandb.Table(columns=columns, data=data)})

    def _log_tree_histograms(self, tree, prefix: str, step: Optional[int]):
        if not self.wandb:
            return
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        hists = {}
        for path, leaf in flat:
            name = "/".join(getattr(p, "key", str(getattr(p, "idx", p)))
                            for p in path)
            hists[f"{prefix}/{name}"] = self.wandb.Histogram(
                np.asarray(leaf).ravel())
        if hists:
            self.wandb.log(hists if step is None else {**hists, "epoch": step})

    def log_param_histograms(self, params, step: Optional[int] = None):
        """Per-layer weight histograms — the parameter half of the
        reference's wandb.watch(log="all") (train_ibtt.py:450-453). No-op
        (and no device sync) without wandb."""
        self._log_tree_histograms(params, "parameters", step)

    def log_grad_histograms(self, grads, step: Optional[int] = None):
        """Per-layer gradient histograms — the gradient half of the
        reference's wandb.watch(log="all") (train_ibtt.py:450-453), sampled
        from one training batch per dispatch block (watch's log_freq=100
        sampling analog). No-op without wandb."""
        self._log_tree_histograms(grads, "gradients", step)

    def finish(self):
        self._f.close()
        if self.wandb:
            self.wandb.finish()


def train(config: dict, model_name: str, limit: Optional[int] = None,
          verbose: bool = True, mesh=None) -> TrainResult:
    dataset_cfg = config["dataset"]
    train_cfg = config.get("train", {})
    output_cfg = config.get("output", {})
    wandb_cfg = config.get("wandb", {"use": False})

    seed = int(train_cfg.get("seed", 0))
    epochs = int(train_cfg.get("epochs", 100))
    batch_size = int(train_cfg.get("batch_size", 128))
    lr = float(train_cfg.get("lr", 1e-3))
    weight_decay = float(train_cfg.get("weight_decay", 1e-4))
    task = dataset_cfg["task"]

    bundle = build_dataset(model_name, dataset_cfg, seed, limit=limit)
    n_train = bundle.n("train")
    if n_train == 0:
        raise RuntimeError("No training examples found. Did you run the task generator?")
    # packed train split: n_train counts ROWS (each holding ~K sequences);
    # scale the row batch so examples-per-step stays ~batch_size, and report
    # throughput in examples
    packed_train = bundle.kind == "tokens" and "seg" in bundle.splits["train"]
    n_train_examples = int(bundle.meta.get("n_examples_train", n_train))
    if packed_train:
        train_bs = max(1, round(batch_size * n_train / max(n_train_examples, 1)))
    else:
        train_bs = batch_size
    # mesh layout from config: parallel.model_axis splits every embedding/
    # Dense feature dim over 'model' (TP); the rest of the devices form
    # 'data' (DP). Built here (not at sharding time) so the packed row
    # batch can be rounded to the 'data' axis — a derived train_bs that
    # misses divisibility must not silently disable sharding.
    parallel_cfg = config.get("parallel", {})
    model_axis = int(parallel_cfg.get("model_axis", 1))
    # parallel.seq_shards splits the sequence axis over a 'seq' mesh axis
    # (ring attention, ops/ring_attention.py) — token transformers only,
    # incompatible with packed rows (the ring has no segment mask)
    seq_shards = int(parallel_cfg.get("seq_shards", 1))
    if seq_shards > 1:
        if model_name not in ("ibtt", "agtt"):
            raise ValueError("parallel.seq_shards applies to the token "
                             "transformers (ibtt/agtt); graph-native models "
                             "have no sequence axis")
        if packed_train:
            raise ValueError("parallel.seq_shards requires dataset.pack: "
                             "false (ring attention has no segment mask)")
    # parallel.pipe_stages runs the encoder stack as a GPipe pipeline over
    # a 'pipe' mesh axis (parallel/pipeline.py) — token transformers only
    pipe_stages = int(parallel_cfg.get("pipe_stages", 1))
    if pipe_stages > 1 and model_name not in ("ibtt", "agtt"):
        raise ValueError("parallel.pipe_stages applies to the token "
                         "transformers (ibtt/agtt); graph-native models "
                         "have no layer pipeline")
    # parallel.expert_shards shards the Switch MoE expert stacks over an
    # 'expert' mesh axis (models/moe.py + parallel/mesh.py param rule)
    expert_shards = int(parallel_cfg.get("expert_shards", 1))
    moe_experts_cfg = int(config.get("model", {}).get("moe_experts", 0))
    if expert_shards > 1:
        if model_name not in ("ibtt", "agtt"):
            raise ValueError("parallel.expert_shards applies to the token "
                             "transformers (ibtt/agtt); the graph-native "
                             "models have no MoE FFN")
        if moe_experts_cfg <= 0:
            raise ValueError("parallel.expert_shards requires model.moe_experts")
        if moe_experts_cfg % expert_shards != 0:
            raise ValueError(
                f"model.moe_experts={moe_experts_cfg} must divide over "
                f"parallel.expert_shards={expert_shards} (otherwise the "
                "expert stacks stay replicated while the mesh still gives "
                "up data-parallel width)")
    # parallel.ep_manual: manual all-to-all MoE dispatch (models/moe.py
    # _manual_ep_ffn) — the batch also shards over 'expert', and the
    # dispatch/combine become explicit lax.all_to_all exchanges instead of
    # GSPMD replicating activations over the expert axis
    ep_manual = bool(parallel_cfg.get("ep_manual", False))
    if ep_manual and expert_shards <= 1:
        raise ValueError("parallel.ep_manual requires parallel.expert_shards")
    if pipe_stages > 1 and moe_experts_cfg > 0:
        raise ValueError("parallel.pipe_stages with model.moe_experts is "
                         "unsupported (the pipeline's layer scan cannot "
                         "capture the MoE aux-loss sow)")
    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh(model_axis=model_axis, seq_shards=seq_shards,
                         pipe_stages=pipe_stages,
                         expert_shards=expert_shards)
    if mesh is not None and packed_train:
        da = int(mesh.shape["data"])
        train_bs = max(da, (train_bs // da) * da)
    if verbose:
        print(f"#train: {n_train} | #val: {bundle.n('val')} | #test: {bundle.n('test')}")
        if packed_train:
            print(f"packed train split: {n_train_examples} examples in "
                  f"{n_train} rows (x{n_train_examples / max(n_train, 1):.2f} "
                  f"density), row batch {train_bs}")
        if task != "zinc" and bundle.kind == "graphs":
            # example-graph logging (reference train_mpnn.py:240-285)
            try:
                from ..data.loader import load_graphs_multi_algorithm
                from .viz import log_graph_examples
                gs = load_graphs_multi_algorithm(
                    dataset_cfg.get("graph_token_root", "graph-token"), task,
                    dataset_cfg.get("train_algorithms", [])[:1], "train",
                    num_graphs=1, num_pairs_per_graph=1, seed=seed)
                if gs:
                    print(log_graph_examples(gs, task=task, num_examples=1))
            except Exception:
                pass
    num_classes = bundle.num_classes
    # SP is active whenever the effective mesh carries a >1 'seq' axis
    # (config-built above, or a caller-supplied mesh=)
    sp_active = (mesh is not None and "seq" in mesh.axis_names
                 and mesh.shape["seq"] > 1)
    if sp_active and packed_train:
        raise ValueError("sequence-parallel mesh requires dataset.pack: "
                         "false (ring attention has no segment mask)")
    # manual-EP is active when the effective mesh carries a >1 'expert'
    # axis AND parallel.ep_manual is set; every batch (train and eval) then
    # shards over data*expert, which both must divide
    ep_active = (ep_manual and mesh is not None
                 and "expert" in mesh.axis_names and mesh.shape["expert"] > 1)
    if ep_active:
        width = int(mesh.shape["data"]) * int(mesh.shape["expert"])
        for bs_check, what in ((train_bs, "train batch"),
                               (batch_size, "eval batch")):
            if bs_check % width != 0:
                raise ValueError(f"{what} {bs_check} not divisible by "
                                 f"data*expert mesh width {width} "
                                 "(parallel.ep_manual)")
    model = build_model(model_name, config, bundle,
                        sp_mesh=mesh if sp_active else None,
                        ep_mesh=mesh if ep_active else None)
    # PP is active whenever the effective mesh carries a >1 'pipe' axis;
    # the forward swaps to the GPipe schedule (parallel/pipeline.py) with
    # the SAME parameter tree, so init/checkpoint/optimizer are untouched
    pp_active = (mesh is not None and "pipe" in mesh.axis_names
                 and mesh.shape["pipe"] > 1)
    pp_ctx = None
    if pp_active:
        n_micro = int(parallel_cfg.get("pipe_microbatches",
                                       mesh.shape["pipe"]))
        nlayers = int(getattr(model, "nlayers", 0))
        if nlayers % mesh.shape["pipe"] != 0:
            raise ValueError(f"model.nlayers={nlayers} must divide over "
                             f"pipe_stages={mesh.shape['pipe']}")
        for bs_check, what in ((train_bs, "train batch"),
                               (batch_size, "eval batch")):
            if bs_check % n_micro != 0:
                raise ValueError(f"{what} {bs_check} not divisible by "
                                 f"pipe_microbatches={n_micro}")
        pp_ctx = {"mesh": mesh, "n_micro": n_micro}

    # steps/schedule
    steps_per_epoch = max(1, (n_train + train_bs - 1) // train_bs)
    sched_name = train_cfg.get("scheduler", "none")
    if sched_name == "cosine_with_warmup":
        warm = int(train_cfg.get("num_warmup_epochs", 5)) * steps_per_epoch
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warm, max(epochs * steps_per_epoch, warm + 1))
    else:
        schedule = lr
    # `train.mu_dtype` stores the AdamW first moment in bf16 BY DEFAULT
    # (optax casts on read/write; nu stays f32 for scale stability) —
    # halves mu HBM traffic, measured +2 MFU points at d2048
    # (MFU_ATTRIB_2048.json bf16_mu 56.3% vs hash-dropout base 54.2%).
    # Accuracy is a measured wash at every shipped benchmark config
    # (MU_AB.json: ibtt-cycle/mpnn-cycle/gps-sp/agtt-zinc best_val equal
    # to f32 within seed spread — the small-model regime is where bf16
    # rounding in the update direction would show first, and it doesn't).
    # `train.mu_dtype: float32` restores the reference-style f32 state;
    # optimizer-state dtype is not a reference-observable surface.
    mu_dtype = train_cfg.get("mu_dtype", "bfloat16")
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay,
                    mu_dtype=jnp.bfloat16 if mu_dtype == "bfloat16" else None),
    )

    # init. `train.prng_impl: rbg` swaps the key implementation for the
    # whole training stream: threefry2x32 (the JAX default, replicable
    # across backends) materializes the [B,H,L,L] attention-dropout mask
    # with ~2 u32 rounds/element and dominates small-model steps; the
    # TPU-native rbg generator cuts that step ~1.25x (measured at the
    # ibtt shape, r3). Opt-in — it changes the dropout stream (same
    # statistical quality, different bits), so default stays threefry.
    prng_impl = train_cfg.get("prng_impl")
    rng = (jax.random.key(seed, impl=prng_impl) if prng_impl
           else jax.random.PRNGKey(seed))
    rng, init_rng = jax.random.split(rng)
    # init from an unpacked split (val shares the parameter structure; the
    # packed/unpacked forwards use the same modules)
    init_split = "val" if packed_train else "train"
    # manual EP shard_maps the forward over data*expert batch shards, so
    # even the init's dummy batch must be that wide (params are batch-
    # size-independent; rows just repeat)
    n_init = (int(mesh.shape["data"]) * int(mesh.shape["expert"])
              if ep_active else 2)
    def _init_rows(v):
        s = v[:2]
        if len(s) < n_init:
            s = np.concatenate([s] * (-(-n_init // max(len(s), 1))))[:n_init]
        return jnp.asarray(s)
    sample = {k: _init_rows(v) for k, v in bundle.splits[init_split].items()}
    # jit the init: eager flax init dispatches op-by-op, which is pathologically
    # slow through a tunneled TPU backend
    if bundle.kind == "tokens":
        variables = jax.jit(lambda r, i, m: model.init(
            r, i, m, q_token_id=bundle.q_token_id, deterministic=True))(
            init_rng, sample["ids"], sample["mask"])
    else:
        variables = jax.jit(lambda r, s: model.init(
            r, s["node_feat"], s["adj"].astype(jnp.float32), s["mask"],
            deterministic=True, etype=s.get("eadj")))(
            init_rng, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt_state = tx.init(params)
    num_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if verbose:
        print(f"Model parameters: {num_params:,}")

    # device-resident split arrays (single transfer), optionally sharded.
    # val and test are padded to a common row count so they share ONE
    # compiled eval function (compiles are expensive on tunneled backends).
    host_splits = dict(bundle.splits)
    n_eval = max(bundle.n("val"), bundle.n("test"), 1)
    for s in ("val", "test"):
        arrays = host_splits[s]
        n = len(arrays["y"])
        if n < n_eval:
            padded = {}
            for k, v in arrays.items():
                reps = np.zeros((n_eval - n,) + v.shape[1:], dtype=v.dtype)
                padded[k] = np.concatenate([v, reps], axis=0)
            host_splits[s] = padded

    # data-parallel sharding: corpus + params replicated, the minibatch
    # index matrices sharded over 'data' — gathered batches inherit the
    # sharding, and GSPMD inserts the gradient/metric all-reduces
    if mesh is not None and batch_size % mesh.shape["data"] == 0 \
            and train_bs % mesh.shape["data"] == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import shard_params as _tp_shard
        _rep = NamedSharding(mesh, P())
        # under manual EP the batch rows shard over BOTH mesh axes (the
        # shard_map in models/moe.py expects data*expert-way batch shards)
        _bax = ("data", "expert") if ep_active else "data"
        _sh1 = NamedSharding(mesh, P(_bax))
        _sh2 = NamedSharding(mesh, P(None, _bax))
        _sh3 = NamedSharding(mesh, P(None, None, _bax))
        put_rep = lambda t: jax.device_put(t, _rep)  # noqa: E731
        put_idx1 = lambda a: jax.device_put(jnp.asarray(a), _sh1)  # noqa: E731
        put_idx2 = lambda a: jax.device_put(jnp.asarray(a), _sh2)  # noqa: E731
        put_idx3 = lambda a: jax.device_put(jnp.asarray(a), _sh3)  # noqa: E731
        put_params = lambda p: _tp_shard(mesh, p)  # noqa: E731
        params = put_params(params)
        # re-derive the optimizer state from the sharded params so the AdamW
        # moments inherit the TP layout (jit lets GSPMD propagate shardings)
        opt_state = jax.jit(tx.init)(params)
        if batch_stats is not None:
            batch_stats = put_rep(batch_stats)
    else:
        put_rep = lambda t: t  # noqa: E731
        put_idx1 = jnp.asarray
        put_idx2 = jnp.asarray
        put_idx3 = jnp.asarray
        put_params = lambda p: p  # noqa: E731
    dev_splits = {s: {k: put_rep(jnp.asarray(v)) for k, v in arrays.items()}
                  for s, arrays in host_splits.items()}

    train_ep, eval_ep, grad_probe = make_epoch_fns(
        model, bundle, tx, task, num_classes, pp=pp_ctx,
        moe_aux_weight=float(config.get("model", {}).get(
            "moe_aux_weight", 0.01)))

    out_dir = output_cfg.get("out_dir", f"runs_{model_name}")
    run_name = output_cfg.get("run_name", f"{model_name}-{task}")
    # W&B run-name carries the training algorithms (train_ibtt.py:443-448);
    # this naming is what the reference's figure column parser keys on
    if task == "zinc":
        wandb_name = run_name
    else:
        wandb_name = f"{run_name} ({'+'.join(dataset_cfg.get('train_algorithms', []))})"
    logger = RunLogger(out_dir, run_name, wandb_cfg, config,
                       wandb_name=wandb_name)
    logger.log({"model/num_parameters": num_params})

    better = (lambda a, b: a < b) if task == "zinc" else (lambda a, b: a > b)
    best_val = float("inf") if task == "zinc" else -1.0
    start_epoch = 1
    if train_cfg.get("resume"):
        # train.resume_path overrides the default out_dir/best_<run> location
        # (CLI --checkpoint; lets eval-only score an arbitrary checkpoint)
        ckpt_path = (train_cfg.get("resume_path")
                     or os.path.join(out_dir, f"best_{run_name}"))
        ckpt = load_checkpoint(ckpt_path)
        if ckpt is None and verbose:
            print(f"[warn] no checkpoint at {ckpt_path}; starting fresh")
        if ckpt is not None and ckpt.get("params") is not None:
            params = put_params(jax.tree.map(jnp.asarray, ckpt["params"]))
            if ckpt.get("batch_stats") is not None:
                batch_stats = jax.tree.map(jnp.asarray, ckpt["batch_stats"])
            if ckpt.get("opt_state"):
                # restore AdamW moments + schedule step so continued training
                # picks up exactly where the best epoch left off (r1 resume
                # silently restarted the optimizer/schedule from step 0)
                saved = ckpt["opt_state"]
                # cast every restored leaf to the live optimizer template's
                # dtype: a checkpoint written under the pre-r5 f32 AdamW mu
                # resumes cleanly under the bf16-mu default (and vice
                # versa) — mu precision is a storage choice, not state
                # semantics
                tmpl_leaves = jax.tree.leaves(opt_state)
                leaves = [jnp.asarray(saved[k]) for k in sorted(saved)]
                template = jax.tree.structure(opt_state)
                if template.num_leaves == len(leaves):
                    leaves = [l.astype(t.dtype) if hasattr(t, "dtype")
                              and l.dtype != t.dtype else l
                              for l, t in zip(leaves, tmpl_leaves)]
                    opt_state = jax.tree.unflatten(template, leaves)
                elif verbose:
                    print("[warn] checkpoint opt_state does not match the "
                          "optimizer; resuming with a fresh optimizer state")
            elif verbose:
                print("[warn] checkpoint has no opt_state (pre-r2 format); "
                      "resuming with a fresh optimizer state")
            best_val = float(ckpt.get("best_val", best_val))
            start_epoch = int(ckpt.get("epoch", 0)) + 1
            if verbose:
                print(f"Resumed from epoch {start_epoch - 1} "
                      f"(best_val={best_val:.4f})")
    best_params = None
    best_bs = None
    if start_epoch > 1:
        # resumed: the loaded params ARE the best so far
        best_params = jax.tree.map(np.asarray, params)
        best_bs = jax.tree.map(np.asarray, batch_stats) if batch_stats is not None else None
    history: List[Dict[str, Any]] = []
    shuffle_rng = np.random.default_rng(seed)
    t0 = time.time()
    time_to_best = 0.0
    initial_val_metric = 0.0

    eval_nb = max(1, (n_eval + batch_size - 1) // batch_size)
    eval_batches = {s: make_batches(bundle.n(s), batch_size, None, pad_to_nb=eval_nb)
                    for s in ("val", "test")}

    # optional profiler trace over a few steady-state epochs
    profile_epochs = set(train_cfg.get("profile_epochs", []) or [])
    profile_dir = os.path.join(out_dir, f"{run_name}_trace")

    # K epochs per jitted dispatch. Any K is exact: the best-epoch state is
    # selected on-device inside the scanned block (val metric, strict
    # improvement), so K>1 only amortizes dispatch latency. Epoch count
    # rounds UP to a multiple of K to keep a single compiled block shape.
    k_disp = max(1, int(train_cfg.get("epochs_per_dispatch", 1)))
    vidx, vvalid = eval_batches["val"]
    vidx_d, vvalid_d = put_idx2(vidx), put_idx2(vvalid)

    epoch = start_epoch
    while epoch <= epochs:
        k = k_disp
        block_start = time.time()
        if epoch in profile_epochs:
            jax.profiler.start_trace(profile_dir)
        idx_k = np.stack([make_batches(n_train, train_bs, shuffle_rng)[0]
                          for _ in range(k)])
        valid_one = make_batches(n_train, train_bs, None)[1]
        valid_k = np.broadcast_to(valid_one, (k,) + valid_one.shape)
        rng, blk_rng = jax.random.split(rng)
        (params, batch_stats, opt_state, tr_k, va_k,
         b_params_blk, b_bs_blk, b_opt_blk, b_metric_blk, b_ep_blk) = train_ep(
            params, batch_stats, opt_state, dev_splits["train"], dev_splits["val"],
            put_idx3(idx_k), put_idx3(np.ascontiguousarray(valid_k)), vidx_d, vvalid_d, blk_rng)
        tr_k = jax.tree.map(np.asarray, tr_k)
        va_k = jax.tree.map(np.asarray, va_k)
        if epoch in profile_epochs:
            jax.profiler.stop_trace()
        block_dur = time.time() - block_start
        dur = block_dur / k

        va_metrics: List[float] = []
        for j in range(k):
            ep = epoch + j
            tr = _epoch_metrics(jax.tree.map(lambda a: a[j], tr_k), task, num_classes)
            va = _epoch_metrics(jax.tree.map(lambda a: a[j], va_k), task, num_classes)
            if task == "zinc":
                tr_metric, va_metric, metric_name = tr["mae"], va["mae"], "mae"
            else:
                tr_metric, va_metric, metric_name = tr["accuracy"], va["accuracy"], "acc"

            cur_lr = schedule(ep * steps_per_epoch) if callable(schedule) else schedule
            log = {
                "epoch": ep,
                "train/loss": tr["loss"], "val/loss": va["loss"],
                "lr": float(cur_lr),
                "time/epoch_duration": dur,
                "throughput/graphs_per_sec": n_train_examples / dur if dur > 0 else 0.0,
                "memory/device_mb": _device_memory_mb(),
            }
            # the reference's key name (train_ibtt.py:514) is emitted as an
            # alias so downstream W&B tooling keyed on it keeps working;
            # "gpu" is a misnomer on TPU, hence the canonical device_mb twin
            log["memory/gpu_allocated_mb"] = log["memory/device_mb"]
            if "grad_norm" in tr:
                log["train/grad_norm"] = tr["grad_norm"]
            if task == "zinc":
                for kk in ("mae", "mse", "rmse"):
                    log[f"train/{kk}"] = tr[kk]
                    log[f"val/{kk}"] = va[kk]
            else:
                log["train/acc"] = tr_metric
                log["val/acc"] = va_metric
                for side, m in (("train", tr), ("val", va)):
                    log[f"{side}/precision"] = m.get("precision", m.get("precision_macro", 0))
                    log[f"{side}/recall"] = m.get("recall", m.get("recall_macro", 0))
                    log[f"{side}/f1"] = m.get("f1", m.get("f1_macro", 0))
                if task == "shortest_path":
                    for side, m in (("train", tr), ("val", va)):
                        log[f"{side}/mse"] = m.get("mse", 0)
                        log[f"{side}/mae"] = m.get("mae", 0)
            gain = abs(va_metric - initial_val_metric)
            elapsed = time.time() - t0
            log["efficiency/time_per_metric_unit"] = elapsed / gain if gain > 0 else 0
            logger.log(log)
            history.append(log)
            if verbose:
                print(f"epoch {ep:03d} | train {tr['loss']:.4f}/{metric_name}="
                      f"{tr_metric:.4f} | val {va['loss']:.4f}/{metric_name}="
                      f"{va_metric:.4f} | time {dur:.2f}s")

            va_metrics.append(va_metric)

        # block-best: the device carried the exact best-epoch state through
        # the scan; adopt it when it beats the global best (strictly, like
        # the reference's per-epoch check)
        blk_ep = int(np.asarray(b_ep_blk))
        if blk_ep >= 0 and better(va_metrics[blk_ep], best_val):
            best_val = va_metrics[blk_ep]
            best_params = jax.tree.map(np.asarray, b_params_blk)
            best_bs = jax.tree.map(np.asarray, b_bs_blk) \
                if b_bs_blk is not None else None
            best_opt = {f"{i:06d}": np.asarray(leaf)
                        for i, leaf in enumerate(jax.tree.leaves(b_opt_blk))}
            time_to_best = time.time() - t0
            save_checkpoint(os.path.join(out_dir, f"best_{run_name}"),
                            {"params": best_params, "batch_stats": best_bs,
                             "opt_state": best_opt,
                             "epoch": epoch + blk_ep, "best_val": best_val,
                             "config": config, "vocab": bundle.vocab,
                             "serve": serving_meta(model_name, bundle)})
        # parameter + gradient histograms at block boundaries (wandb.watch
        # log="all" parity); no-op without wandb, so the jitted loop never
        # syncs (and the grad probe never runs) for it
        logger.log_param_histograms(params, step=epoch + k - 1)
        if logger.wandb:
            # derive the probe key OUT-OF-STREAM (fold_in, not split): the
            # probe is observability-only, and consuming the main rng here
            # would make enabling wandb change every later block's dropout
            # keys — i.e. the training trajectory
            probe_rng = jax.random.fold_in(rng, epoch)
            grads = grad_probe(params, batch_stats, dev_splits["train"],
                               put_idx1(idx_k[-1, 0]),
                               put_idx1(np.ascontiguousarray(valid_k[-1, 0])),
                               probe_rng)
            logger.log_grad_histograms(grads, step=epoch + k - 1)
        epoch += k

    total_time = time.time() - t0

    # reload best, run OOD test (reference train_ibtt.py:579-614)
    if best_params is not None:
        params = jax.tree.map(jnp.asarray, best_params)
        batch_stats = jax.tree.map(jnp.asarray, best_bs) if best_bs is not None else None

    # eval-only (epochs=0 + resume): no epoch ran, so score the val split
    # here — the in-loop val evaluation never executed
    if epochs < start_epoch and best_params is not None and bundle.n("val"):
        va_stats = eval_ep(params, batch_stats, dev_splits["val"],
                           vidx_d, vvalid_d)
        va = _epoch_metrics(va_stats, task, num_classes)
        va_metric = va["mae"] if task == "zinc" else va["accuracy"]
        logger.log({"val/loss": va["loss"],
                    ("val/mae" if task == "zinc" else "val/acc"): va_metric})
        if verbose:
            name = "mae" if task == "zinc" else "acc"
            print(f"eval-only | val {va['loss']:.4f}/{name}={va_metric:.4f}")
    if bundle.n("test") == 0:
        # reference behavior: warn and continue (train_ibtt.py:346-347)
        print("[warn] No test examples found. Test metrics will be trivial.")
        te = {"loss": 0.0} | ({"mae": 0.0, "mse": 0.0, "rmse": 0.0}
                             if task == "zinc" else {"accuracy": 0.0})
    else:
        tidx, tvalid = eval_batches["test"]
        te_stats = eval_ep(params, batch_stats, dev_splits["test"],
                           put_idx2(tidx), put_idx2(tvalid))
        te = _epoch_metrics(te_stats, task, num_classes)
    if task != "zinc" and "confusion_matrix" in te:
        try:
            from .viz import class_names, create_confusion_matrix_heatmap
            cm = te["confusion_matrix"]
            img = create_confusion_matrix_heatmap(cm, task,
                                                  title="Test Confusion Matrix")
            img.save(os.path.join(out_dir, f"{run_name}_test_cm.png"))
            # W&B CM image + table parity (train_ibtt.py:641-663)
            logger.log_image("test/confusion_matrix_heatmap", img,
                             caption="Confusion Matrix")
            if cm.shape[0] <= 30:  # W&B table is C×(C+1) cells; skip huge C
                labels = class_names(task, cm.shape[0])
                logger.log_table("test/confusion_matrix",
                                 ["True/Pred"] + labels,
                                 [[lab] + cm[i].tolist()
                                  for i, lab in enumerate(labels)])
        except Exception:
            pass

    if verbose:
        print("\n" + "=" * 80 + "\nTEST RESULTS\n" + "=" * 80)
        print(f"Loss: {te['loss']:.4f}")
        if task == "zinc":
            print(f"MAE: {te['mae']:.4f}\nMSE: {te['mse']:.4f}\nRMSE: {te['rmse']:.4f}")
        else:
            print(f"Accuracy: {te['accuracy']:.4f}")
            if "confusion_matrix" in te:
                print("\n" + format_confusion_matrix(te["confusion_matrix"], task))
        print(f"\nTotal training time: {total_time:.2f}s")
        print(f"Time to best validation: {time_to_best:.2f}s")

    test_log = {"test/loss": te["loss"],
                "time/total_train_time": total_time,
                "time/time_to_best_val": time_to_best}
    if task == "zinc":
        test_log |= {f"test/{k}": te[k] for k in ("mae", "mse", "rmse")}
    else:
        test_log["test/acc"] = te["accuracy"]
        test_log["test/precision"] = te.get("precision", te.get("precision_macro", 0))
        test_log["test/recall"] = te.get("recall", te.get("recall_macro", 0))
        test_log["test/f1"] = te.get("f1", te.get("f1_macro", 0))
        if task == "shortest_path":
            test_log["test/mse"] = te.get("mse", 0)
            test_log["test/mae"] = te.get("mae", 0)
    logger.log(test_log)
    logger.finish()

    return TrainResult(best_val=best_val, test_metrics=te, history=history,
                       params=params, bundle=bundle)
