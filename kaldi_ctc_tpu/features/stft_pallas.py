"""Pallas fused STFT → log-mel kernel.

The feature-extraction hot path (ProcessWindow + ComputePowerSpectrum +
MelBanks::Compute of ``src/feat/feature-window.cc`` /
``feature-fbank.cc``) as ONE TPU kernel over frame blocks: DC removal,
raw frame energy, preemphasis (lane roll), window multiply, the DFT as
two MXU matmuls against cos/sin tables (zero-padding to the FFT size is
implicit — the tables are built for the unpadded window length), power,
mel projection, and log — with no HBM round-trips between stages.

The XLA path (features/window.py + fbank.py) remains the reference
implementation; this kernel is parity-tested against it in interpret
mode and auto-dispatched on TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["log_mel_pallas", "dft_tables"]

_BLOCK_F = 128  # frames per grid step


def dft_tables(window_size: int, padded_size: int,
               num_bins: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices [window_size, num_bins] for bins
    0..num_bins-1 of a padded_size-point transform (zero padding beyond
    window_size contributes nothing, so rows stop at window_size)."""
    n = np.arange(window_size, dtype=np.float64)[:, None]
    k = np.arange(num_bins, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * n * k / padded_size
    return (np.cos(ang).astype(np.float32),
            -np.sin(ang).astype(np.float32))


def _kernel(frames_ref, window_ref, cos_ref, sin_ref, mel_ref,
            out_ref, energy_ref, *, remove_dc: bool, preemph: float,
            use_power: bool, use_log: bool):
    x = frames_ref[...]                       # [bf, L]
    if remove_dc:
        x = x - jnp.mean(x, axis=1, keepdims=True)
    # raw frame energy: after DC removal, before preemphasis/window
    # (feature-window.cc ProcessWindow order)
    eps = jnp.finfo(jnp.float32).eps
    energy_ref[...] = jnp.log(
        jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), eps))
    if preemph != 0.0:
        rolled = pltpu.roll(x, 1, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        shifted = jnp.where(col == 0, x, rolled)  # x[i-1], edge duplicated
        x = x - preemph * shifted
    x = x * window_ref[...]
    # full-f32 MXU precision: the DFT has heavy cancellation and the
    # default (bf16-passes) matmul precision visibly corrupts log-mel
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(x, cos_ref[...], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(x, sin_ref[...], preferred_element_type=jnp.float32,
                 precision=hi)
    p = re * re + im * im
    if not use_power:
        p = jnp.sqrt(p)
    m = jnp.dot(p, mel_ref[...], preferred_element_type=jnp.float32,
                precision=hi)
    if use_log:
        m = jnp.log(jnp.maximum(m, eps))
    out_ref[...] = m


def log_mel_pallas(frames: jnp.ndarray, window: jnp.ndarray,
                   mel: jnp.ndarray, padded_size: int,
                   remove_dc: bool = True, preemph: float = 0.97,
                   use_power: bool = True, use_log: bool = True,
                   interpret: bool = False):
    """frames [F, L] (raw, post-dither) → (mel features [F, M],
    raw log energies [F]).

    mel: [M, K] filterbank over DFT bins 0..K-1 (Nyquist excluded, the
    feature-fbank.cc convention)."""
    f, length = frames.shape
    m_bins, k_bins = mel.shape
    cos_t, sin_t = dft_tables(length, padded_size, k_bins)
    bf = min(_BLOCK_F, max(f, 1))
    f_pad = -(-f // bf) * bf
    if f_pad != f:
        frames = jnp.pad(frames, ((0, f_pad - f), (0, 0)))
    kern = functools.partial(
        _kernel, remove_dc=remove_dc, preemph=float(preemph),
        use_power=use_power, use_log=use_log)
    out, energy = pl.pallas_call(
        kern,
        grid=(f_pad // bf,),
        in_specs=[
            pl.BlockSpec((bf, length), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, length), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, k_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, k_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_bins, m_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bf, m_bins), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((f_pad, m_bins), jnp.float32),
                   jax.ShapeDtypeStruct((f_pad, 1), jnp.float32)],
        interpret=interpret,
    )(frames, window[None, :], jnp.asarray(cos_t), jnp.asarray(sin_t),
      jnp.asarray(mel).T)
    return out[:f], energy[:f, 0]
