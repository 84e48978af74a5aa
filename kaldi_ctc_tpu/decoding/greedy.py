"""Greedy (best-path) CTC decoding.

The fast path used for training accuracy and quick WER: framewise argmax
→ collapse repeats → drop blanks (the rule of ComputeTotAccuracy,
``ctc/ctc-nnet-update.cc:261-317``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.ops.ctc import greedy_collapse

__all__ = ["greedy_decode"]


@jax.jit
def greedy_decode(
    scores: jnp.ndarray,       # [B, T, A] (logits or log-probs; argmax same)
    input_lens: jnp.ndarray,   # [B]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (labels [B, T] padded, lengths [B])."""
    return greedy_collapse(jnp.argmax(scores, axis=-1), input_lens)
