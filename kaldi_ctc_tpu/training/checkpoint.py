"""Checkpointing: params + optimizer state + step, with retention policy.

Replaces the reference's one-file-per-iteration ``$x.mdl`` checkpoints
(``ctcbin/nnet2-ctc-train-simple.cc:100-104``) and the retention rule
"keep every 100th and the last few" (``steps/ctc/train.sh:450-452,527-535``).
Checkpoints are dependency-free numpy .npz files (one directory per step
with arrays + a JSON meta sidecar) — trivially portable and inspectable.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "cfg_for_checkpoint",
           "apply_retention", "read_meta"]

_STEP_RE = re.compile(r"^step_(\d+)$")


def _flatten(tree: Any) -> Tuple[List[np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save a pytree state under ckpt_dir/step_<N>/ (atomic rename)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    final = os.path.join(ckpt_dir, f"step_{step}")
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    leaves, treedef = _flatten(state)
    np.savez(os.path.join(tmp, "arrays.npz"),
             **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    meta = {"step": step, "num_leaves": len(leaves),
            "extra": extra or {}}
    # Params-prefix contract for inference-time loaders: TrainState is a
    # NamedTuple with `params` FIRST, and tree_flatten walks fields in
    # order, so leaves [0, num_param_leaves) are exactly the params
    # regardless of what optimizer/NG state follows.  Recording the
    # count lets restore_params load a checkpoint whose training-state
    # shape the loader does not know (e.g. NG-SGD preconditioner state).
    if hasattr(state, "params"):
        meta["num_param_leaves"] = len(
            jax.tree_util.tree_leaves(state.params))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def restore_checkpoint(ckpt_dir: str, like: Any,
                       step: Optional[int] = None) -> Tuple[Any, Dict]:
    """Restore into the structure of `like`. step=None → latest."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step}")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "arrays.npz"))
    leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    _, treedef = jax.tree_util.tree_flatten(like)
    state = jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(l) for l in leaves])
    return state, meta


def restore_params(ckpt_dir: str, params_like: Any,
                   step: Optional[int] = None) -> Tuple[Any, Dict]:
    """Restore ONLY the model params from a checkpoint, whatever
    training state (momentum velocity, NG preconditioners, ...) was
    saved alongside them.

    Relies on the params-prefix contract (see save_checkpoint): the
    first len(params_like) leaves are the params.  Verified against the
    recorded ``num_param_leaves`` when the checkpoint has it; older
    checkpoints without the field are accepted as long as they hold at
    least that many leaves (their prefix is still the params for every
    TrainState shape ever written)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"step_{step}")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    _, treedef = jax.tree_util.tree_flatten(params_like)
    n = treedef.num_leaves
    recorded = meta.get("num_param_leaves")
    if recorded is not None and recorded != n:
        raise ValueError(
            f"checkpoint {path} has {recorded} param leaves, the model "
            f"template expects {n} — config/checkpoint mismatch")
    if meta["num_leaves"] < n:
        raise ValueError(
            f"checkpoint {path} holds only {meta['num_leaves']} leaves, "
            f"params need {n}")
    data = np.load(os.path.join(path, "arrays.npz"))
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)])
    return params, meta


def read_meta(ckpt_dir: str, step: Optional[int] = None) -> Dict:
    """Read a checkpoint's meta.json without loading arrays (lets a resume
    rebuild the right model template, e.g. after layer-wise growth)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    with open(os.path.join(ckpt_dir, f"step_{step}", "meta.json")) as f:
        return json.load(f)


def cfg_for_checkpoint(ckpt_dir: str, cfg, step: Optional[int] = None):
    """Reconcile an AmConfig with a checkpoint's saved layer count.

    Layer-wise growth rewrites model_config.json BEFORE the first
    checkpoint at the new size exists, and earlier checkpoints keep the
    old size — the checkpoint's meta, not the config file, is the truth
    for the restore template.  Returns cfg unchanged when the meta has
    no layer record (e.g. checkpoints written by average_models of
    mixed provenance) or already matches."""
    import dataclasses
    try:
        layers = read_meta(ckpt_dir, step=step)["extra"].get("num_layers")
    except Exception:
        return cfg
    if layers and layers != cfg.num_layers:
        return dataclasses.replace(cfg, num_layers=layers)
    return cfg


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for n in os.listdir(ckpt_dir)
             if (m := _STEP_RE.match(n))]
    return max(steps) if steps else None


def apply_retention(ckpt_dir: str, keep_every: int = 100,
                    keep_last: int = 8) -> List[int]:
    """Delete checkpoints except every `keep_every`-th and the last
    `keep_last` (steps/ctc/train.sh:450-452). Returns removed steps."""
    if not os.path.isdir(ckpt_dir):
        return []
    steps = sorted(int(m.group(1)) for n in os.listdir(ckpt_dir)
                   if (m := _STEP_RE.match(n)))
    if not steps:
        return []
    keep = set(s for s in steps if keep_every > 0 and s % keep_every == 0)
    keep.update(steps[-keep_last:] if keep_last > 0 else [])
    removed = []
    for s in steps:
        if s not in keep:
            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"))
            removed.append(s)
    return removed
