"""Checkpoint save/restore (the reference is save-only, no resume:
trainer/train_ibtt.py:568-574; we add real restore for resume support).

Uses Orbax when importable, with a numpy ``.npz`` + JSON fallback that has
zero heavyweight deps (arrays flattened by pytree path).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif tree is None:
        pass
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return tree


def serving_meta(model_name: str, bundle) -> Dict[str, Any]:
    """JSON block embedded in checkpoints so serve.Predictor can rebuild
    the model and its tokenizers without the training corpus: everything
    build_model and the input encoders read off the DatasetBundle."""
    return {
        "model_name": model_name,
        "task": bundle.task,
        "kind": bundle.kind,
        "num_classes": int(bundle.num_classes),
        "vocab_size": int(bundle.vocab_size),
        "q_token_id": None if bundle.q_token_id is None else int(bundle.q_token_id),
        "in_dim": int(bundle.in_dim),
        "meta": {k: (int(v) if isinstance(v, (int, np.integer)) else v)
                 for k, v in bundle.meta.items()},
    }


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    meta: Dict[str, Any] = {}
    for section in ("params", "batch_stats", "opt_state"):
        if state.get(section) is not None:
            flat = _flatten(state[section], f"{section}/")
            arrays.update(flat)
    # np.savez silently degrades ml_dtypes extension dtypes (bfloat16 —
    # the AdamW mu default since r5) to raw void ('|V2'); store such
    # arrays as a same-width uint view and record the true dtype so
    # load_checkpoint restores them bit-exactly
    ext_dtypes = {}
    for k, v in arrays.items():
        if v.dtype.kind == "V" or v.dtype.name not in np.sctypeDict:
            ext_dtypes[k] = v.dtype.name
            arrays[k] = v.view(np.dtype(f"u{v.dtype.itemsize}"))
    if ext_dtypes:
        meta["ext_dtypes"] = ext_dtypes
    for k in ("epoch", "best_val", "config", "vocab", "serve"):
        if k in state and state[k] is not None:
            meta[k] = state[k]
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if path.endswith(".npz"):
        # checkpoints are a <stem>.npz + <stem>.json pair; accept either the
        # stem or the .npz filename a user tab-completes (CLI --checkpoint)
        path = path[: -len(".npz")]
    if not os.path.isfile(path + ".npz"):
        return None
    z = np.load(path + ".npz")
    flat = {k: z[k] for k in z.files}
    meta = {}
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    for k, name in meta.pop("ext_dtypes", {}).items():
        if k in flat:
            import ml_dtypes  # bfloat16 et al. register through here
            flat[k] = flat[k].view(np.dtype(getattr(ml_dtypes, name)))
    tree = _unflatten(flat)
    return {
        "params": tree.get("params"),
        "batch_stats": tree.get("batch_stats"),
        "opt_state": tree.get("opt_state"),
        **meta,
    }
