"""The CTC acoustic model: recurrent stack + output projection + priors.

Replaces the reference's nnet2 model layer for the 'google' CTC config
(``make_configs.py:237-365``: stacked CuDNNRecurrentComponents → affine to
num_targets → softmax appended at prior-adjustment time) and the AmNnet
prior carrier (``nnet2/am-nnet.h:38-67``).  Output index 0 is the blank
(CtcTransitionModel's +1 shift, ``ctc/ctc-transition-model.h:56-62``);
priors default to ones with prior[blank]=9
(``ctcbin/nnet2-ctc-init-model.cc:64-67``).

Parameters are a plain pytree so sharding rules (parallel/mesh.py) can
annotate the gate/hidden axes for tensor parallelism.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_ctc_tpu.ops.rnn import RnnConfig, RnnMode, init_rnn_params, rnn_forward

__all__ = ["AmConfig", "init_am_params", "am_forward", "default_priors"]


@dataclasses.dataclass(frozen=True)
class AmConfig:
    """Model config (the dataclass replacement for make_configs.py output)."""

    input_dim: int
    num_targets: int  # pdfs + 1 blank; blank = index 0
    hidden_dim: int = 320
    num_layers: int = 5
    mode: RnnMode = RnnMode.LSTM
    bidirectional: bool = True
    param_stddev: float = 0.02
    bias_stddev: float = 0.2
    dropout: float = 0.0
    # matmul compute dtype: "float32" or "bfloat16" (mixed precision)
    compute_dtype: str = "float32"
    # input splicing (nnet2 SpliceComponent, edge-clamped): frames
    # [-splice_left .. +splice_right] concatenated per step
    splice_left: int = 0
    splice_right: int = 0
    # the 'FT' model type (make_configs.py:269-279): an Affine + ReLU +
    # renormalize front layer of this width before the RNN stack
    # (AddAffRelNormLayer); 0 = 'google' (RNN-first)
    front_affine_dim: int = 0

    @property
    def spliced_dim(self) -> int:
        return self.input_dim * (1 + self.splice_left + self.splice_right)

    @property
    def rnn(self) -> RnnConfig:
        return RnnConfig(
            input_dim=(self.front_affine_dim or self.spliced_dim),
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            mode=self.mode,
            bidirectional=self.bidirectional,
            param_stddev=self.param_stddev,
            bias_stddev=self.bias_stddev,
            compute_dtype=self.compute_dtype,
        )

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["mode"] = int(self.mode)
        return d

    @staticmethod
    def from_dict(d: dict) -> "AmConfig":
        d = dict(d)
        d["mode"] = RnnMode(d["mode"])
        return AmConfig(**d)


def default_priors(num_targets: int, blank_prior: float = 9.0) -> np.ndarray:
    """Prior vector: ones with a large blank prior (nnet2-ctc-init-model.cc:64-67)."""
    p = np.ones(num_targets, dtype=np.float32)
    p[0] = blank_prior
    return p


def init_am_params(key: jax.Array, cfg: AmConfig) -> Dict[str, Any]:
    k_rnn, k_w, k_f = jax.random.split(key, 3)
    out_in = cfg.rnn.output_dim
    params = {
        "rnn": init_rnn_params(k_rnn, cfg.rnn),
        "out_w": cfg.param_stddev * jax.random.normal(
            k_w, (out_in, cfg.num_targets), dtype=jnp.float32),
        "out_b": jnp.zeros((cfg.num_targets,), dtype=jnp.float32),
    }
    if cfg.front_affine_dim:
        params["front_w"] = cfg.param_stddev * jax.random.normal(
            k_f, (cfg.spliced_dim, cfg.front_affine_dim),
            dtype=jnp.float32)
        params["front_b"] = jnp.zeros((cfg.front_affine_dim,),
                                      dtype=jnp.float32)
    return params


def grow_rnn_layer(params: Dict[str, Any], cfg: AmConfig,
                   key: jax.Array) -> tuple:
    """Append a freshly initialized recurrent layer (layer-wise growth,
    the nnet-insert step of steps/ctc/train.sh:357-384).

    Returns (new_params, new_cfg). The caller must rebuild jitted steps
    and optimizer state (the pytree structure changed).
    """
    new_cfg = dataclasses.replace(cfg, num_layers=cfg.num_layers + 1)
    in_dim = cfg.rnn.output_dim
    g = {RnnMode.RELU: 1, RnnMode.TANH: 1, RnnMode.LSTM: 4, RnnMode.GRU: 3}[
        cfg.mode]
    dirs = []
    for _ in range(cfg.rnn.num_directions):
        key, k1, k2, k3 = jax.random.split(key, 4)
        dirs.append({
            "w_x": cfg.param_stddev * jax.random.normal(
                k1, (in_dim, g * cfg.hidden_dim), dtype=jnp.float32),
            "w_h": cfg.param_stddev * jax.random.normal(
                k2, (cfg.hidden_dim, g * cfg.hidden_dim), dtype=jnp.float32),
            "b": cfg.bias_stddev * jax.random.normal(
                k3, (g * cfg.hidden_dim,), dtype=jnp.float32),
        })
    new_params = dict(params)
    new_params["rnn"] = list(params["rnn"]) + [{"dirs": dirs}]
    return new_params, new_cfg


def am_forward(
    params: Dict[str, Any],
    feats: jnp.ndarray,            # [B, T, D] batch-major
    cfg: AmConfig,
    input_lens: Optional[jnp.ndarray] = None,
    dropout_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Forward pass → logits [B, T, num_targets].

    Internally time-major for the scan; the final projection is one large
    [T*B, H] @ [H, A] matmul.
    """
    x = jnp.swapaxes(feats, 0, 1)  # [T, B, D]
    if cfg.splice_left or cfg.splice_right:
        # SpliceComponent with edge clamping: concat frames t-L..t+R.
        # Clamp at each utterance's true last frame (input_lens), not the
        # batch-padded T-1, so the tail context matches exact-length
        # inference instead of splicing in pad frames.
        parts = []
        t = x.shape[0]
        last = (jnp.full((1,), t - 1, jnp.int32) if input_lens is None
                else jnp.maximum(input_lens - 1, 0))  # [B] or [1]
        for off in range(-cfg.splice_left, cfg.splice_right + 1):
            idx = jnp.minimum(
                jnp.maximum(jnp.arange(t)[:, None] + off, 0),
                last[None, :])                       # [T, B]
            parts.append(jnp.take_along_axis(
                x, idx[..., None], axis=0))
        x = jnp.concatenate(parts, axis=-1)
    if cfg.front_affine_dim:
        # FT front layer: Affine + ReLU + renormalize to unit RMS
        # (AddAffRelNormLayer, make_configs.py:269-274)
        cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        h = (jnp.dot(x.astype(cd), params["front_w"].astype(cd),
                     preferred_element_type=jnp.float32)
             + params["front_b"])
        h = jax.nn.relu(h)
        rms = jnp.sqrt(jnp.mean(h * h, axis=-1, keepdims=True) + 1e-20)
        x = h / rms
    y = rnn_forward(params["rnn"], x, cfg.rnn, input_lens)
    if cfg.dropout > 0.0 and dropout_key is not None:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_key, keep, y.shape)
        y = jnp.where(mask, y / keep, 0.0)
    t, b, h = y.shape
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    logits = (jnp.dot(y.reshape(t * b, h).astype(cd),
                      params["out_w"].astype(cd),
                      preferred_element_type=jnp.float32)
              + params["out_b"]).reshape(t, b, -1)
    return jnp.swapaxes(logits, 0, 1)  # [B, T, A]
