"""Log power-spectrogram features (reference:
src/feat/feature-spectrogram.{h,cc}).

Dim = padded_window_size/2 + 1; each row is the log power spectrum
floored at float epsilon, with column 0 overwritten by the frame's log
energy (raw by default, post-window when raw_energy=False) —
SpectrogramComputer::Compute (feature-spectrogram.cc:52-82).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_ctc_tpu.features.window import (
    FrameOptions,
    feature_window,
    frame_signal,
    padded_power_spectrum,
    process_frames,
)

__all__ = ["SpectrogramOptions", "compute_spectrogram"]


@dataclasses.dataclass(frozen=True)
class SpectrogramOptions:
    """Mirror of SpectrogramOptions (feature-spectrogram.h:37-54)."""

    frame_opts: FrameOptions = FrameOptions()
    energy_floor: float = 0.0
    raw_energy: bool = True

    @property
    def dim(self) -> int:
        return self.frame_opts.padded_window_size // 2 + 1


def compute_spectrogram(
    wave: jnp.ndarray,
    opts: SpectrogramOptions = SpectrogramOptions(),
    dither_key: Optional[jax.Array] = None,
    vtln_warp: float = 1.0,   # ignored; interface parity with the
    # other computers (feature-spectrogram.h:84 ignores it too)
) -> jnp.ndarray:
    """[num_samples] → [num_frames, padded/2+1] log power spectrogram."""
    fo = opts.frame_opts
    window = jnp.asarray(feature_window(fo))
    frames = frame_signal(wave, fo)
    frames, raw_energy = process_frames(
        frames, fo, window, dither_key=dither_key,
        need_raw_energy=opts.raw_energy)
    if not opts.raw_energy:
        raw_energy = jnp.log(jnp.maximum(
            jnp.sum(frames * frames, axis=1), jnp.finfo(jnp.float32).eps))
    power = padded_power_spectrum(frames, fo)
    eps = jnp.finfo(jnp.float32).eps
    feats = jnp.log(jnp.maximum(power, eps))
    energy = raw_energy
    if opts.energy_floor > 0.0:
        energy = jnp.maximum(energy, float(np.log(opts.energy_floor)))
    return feats.at[:, 0].set(energy)
