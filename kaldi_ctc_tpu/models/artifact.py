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

__all__ = ["save_inference_artifact", "load_inference_artifact"]


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
