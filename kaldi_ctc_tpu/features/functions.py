"""Delta features and frame splicing (reference: src/feat/feature-functions.{h,cc}).

Both are expressed as static gathers + weighted sums so they fuse into the
surrounding XLA computation (no per-frame host loops).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["delta_coeffs", "add_deltas", "splice_frames"]


def delta_coeffs(order: int = 2, window: int = 2) -> list:
    """Delta filter coefficients (DeltaFeatures ctor, feature-functions.cc).

    Returns a list of 1-D arrays; entry k is the filter for the k-th order
    delta, of length 1 + 2*k*window.
    """
    scales = [np.array([1.0])]
    for _ in range(order):
        prev = scales[-1]
        cur = np.zeros(prev.shape[0] + 2 * window)
        norm = sum(j * j for j in range(-window, window + 1))
        for j in range(-window, window + 1):
            cur[window + j: window + j + prev.shape[0]] += (j / norm) * prev
        scales.append(cur)
    return [s.astype(np.float32) for s in scales]


def add_deltas(feats: jnp.ndarray, order: int = 2, window: int = 2) -> jnp.ndarray:
    """[T, D] → [T, D*(order+1)] with edge-replicated context."""
    coeffs = delta_coeffs(order, window)
    t = feats.shape[0]
    outs = []
    for k, c in enumerate(coeffs):
        half = k * window
        idx = jnp.clip(jnp.arange(t)[:, None] + jnp.arange(-half, half + 1)[None, :],
                       0, t - 1)
        ctx = feats[idx]  # [T, len(c), D]
        outs.append(jnp.einsum("tcd,c->td", ctx, jnp.asarray(c)))
    return jnp.concatenate(outs, axis=1)


def splice_frames(feats: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """[T, D] → [T, D*(left+1+right)] with edge replication (SpliceFrames)."""
    t = feats.shape[0]
    idx = jnp.clip(jnp.arange(t)[:, None] + jnp.arange(-left, right + 1)[None, :],
                   0, t - 1)
    ctx = feats[idx]  # [T, C, D]
    return ctx.reshape(t, -1)
