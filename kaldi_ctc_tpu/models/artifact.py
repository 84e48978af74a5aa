"""Deployable inference artifact: params + config + priors in one file.

The final-model surface of the reference (``final.mdl`` =
CtcTransitionModel + AmNnet with dropout removed and priors attached,
``steps/ctc/train.sh:458-509``; copied/edited by ``nnet-am-copy``).
A single ``.npz`` holds the flattened param leaves, the AmConfig JSON,
and the prior vector, so serving needs no checkpoint directory or
optimizer state.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Tuple

import numpy as np

__all__ = ["save_inference_artifact", "load_inference_artifact",
           "load_acoustic_model"]


def save_inference_artifact(path: str, params: Any, cfg,
                            priors: Optional[np.ndarray] = None) -> None:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__config__"] = np.frombuffer(
        json.dumps(cfg.to_dict()).encode(), dtype=np.uint8)
    if priors is not None:
        arrays["__priors__"] = np.asarray(priors, np.float32)
    # write through a handle so numpy cannot append '.npz' and leave the
    # artifact at a different path than the one we log and later load
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_inference_artifact(path: str) -> Tuple[Any, "AmConfig",
                                                Optional[np.ndarray]]:
    """→ (params, cfg, priors-or-None)."""
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.models.acoustic import AmConfig, init_am_params

    with np.load(path) as data:
        cfg = AmConfig.from_dict(
            json.loads(bytes(data["__config__"]).decode()))
        template = init_am_params(jax.random.PRNGKey(0), cfg)
        _, treedef = jax.tree_util.tree_flatten(template)
        n = len(jax.tree_util.tree_leaves(template))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        priors = (np.asarray(data["__priors__"])
                  if "__priors__" in data else None)
    return params, cfg, priors


def load_acoustic_model(model: Optional[str] = None,
                        dir: Optional[str] = None,
                        step: Optional[int] = None):
    """One loader for every CLI → (params, cfg, priors, meta).

    `model`: single-file inference artifact (priors embedded, meta None).
    `dir`: training directory — model_config.json reconciled with the
    checkpoint's layer count first (cfg_for_checkpoint: layer-wise
    growth rewrites the config before a checkpoint at the new size
    exists), then the checkpoint restored; `priors.npy` is picked up
    when present; meta is the checkpoint metadata (e.g. meta["step"]).

    Raises ValueError when neither source is given.
    """
    if model:
        params, cfg, priors = load_inference_artifact(model)
        return params, cfg, priors, None
    if not dir:
        raise ValueError("need a model artifact (--model) or a "
                         "training dir (--dir)")
    import os

    import jax

    from kaldi_ctc_tpu.models.acoustic import AmConfig, init_am_params
    from kaldi_ctc_tpu.training.checkpoint import (
        cfg_for_checkpoint, restore_params)
    with open(os.path.join(dir, "model_config.json")) as f:
        cfg = AmConfig.from_dict(json.load(f))
    cfg = cfg_for_checkpoint(os.path.join(dir, "checkpoints"), cfg,
                             step=step)
    # params-only restore: inference must not need to reconstruct the
    # training-state shape (a checkpoint written with --affine-type
    # natural carries NG preconditioner leaves the decoder knows
    # nothing about)
    params, meta = restore_params(
        os.path.join(dir, "checkpoints"),
        init_am_params(jax.random.PRNGKey(0), cfg), step=step)
    ppath = os.path.join(dir, "priors.npy")
    priors = np.load(ppath) if os.path.exists(ppath) else None
    return params, cfg, priors, meta
