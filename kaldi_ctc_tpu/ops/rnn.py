"""Multi-layer (B)LSTM/GRU/ReLU/Tanh recurrent stacks on ``lax.scan``.

TPU-native replacement for the reference's cuDNN RNN surface
(``src/cudamatrix/cudnn-recurrent.h:17-140`` and
``src/nnet2/nnet-cudnn-component.{h,cc}``): same capability set — modes
RELU(0)/TANH(1)/LSTM(2)/GRU(3) matching the reference's rnn-mode integers
(``nnet-cudnn-component.cc:252-259``), multi-layer, bidirectional — but
designed for the MXU rather than translated:

- the input projection ``x @ W_x + b`` for ALL timesteps is hoisted out of
  the recurrence into one large ``[T*B, D] @ [D, G]`` matmul (MXU-saturating);
  the scan body only does the ``[B, H] @ [H, G]`` recurrent matmul plus
  VPU gate fusion — the same factorization cuDNN uses internally, expressed
  so XLA can pipeline it;
- the backward direction is ``lax.scan(..., reverse=True)`` over the same
  buffers (no explicit sequence reversal copies);
- parameters are plain pytrees (per-layer dicts) so ``pjit`` sharding rules
  can target gate/hidden axes directly for model parallelism.

Length handling: unlike the reference, which lets the backward BLSTM pass
consume pad frames (SURVEY §7.3), ``input_lens`` masks the recurrence so
state carries across pad frames and outputs there are zero.  This is a
deliberate correctness improvement; CTC itself is pad-safe either way since
the loss receives true input lengths.

GRU uses the cuDNN "linear-before-reset" formulation (the variant the
reference's cudnn wrapper exposes).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["RnnMode", "RnnConfig", "init_rnn_params", "rnn_forward",
           "init_stream_state", "rnn_forward_stream"]


class RnnMode(enum.IntEnum):
    """Matches the reference's rnn-mode config integers."""

    RELU = 0
    TANH = 1
    LSTM = 2
    GRU = 3


_GATES = {RnnMode.RELU: 1, RnnMode.TANH: 1, RnnMode.LSTM: 4, RnnMode.GRU: 3}


@dataclasses.dataclass(frozen=True)
class RnnConfig:
    """Mirror of CuDNNRecurrentComponent's config surface
    (nnet-cudnn-component.cc:72-98,488-491)."""

    input_dim: int
    hidden_dim: int
    num_layers: int = 1
    mode: RnnMode = RnnMode.LSTM
    bidirectional: bool = True  # reference default (nnet-cudnn-component.cc:488)
    param_stddev: float = 0.02
    bias_stddev: float = 0.2
    # recurrent kernel implementation: "xla" (lax.scan), "pallas" (fused
    # VMEM-resident cell, LSTM only), or "auto" (pallas on TPU for LSTM)
    implementation: str = "auto"
    # matmul compute dtype: "float32" or "bfloat16" (mixed precision —
    # params/state stay f32, MXU operands cast, f32 accumulation)
    compute_dtype: str = "float32"

    @property
    def num_directions(self) -> int:
        return 2 if self.bidirectional else 1

    @property
    def output_dim(self) -> int:
        return self.hidden_dim * self.num_directions

    def layer_input_dim(self, layer: int) -> int:
        return self.input_dim if layer == 0 else self.output_dim


def init_rnn_params(key: jax.Array, cfg: RnnConfig) -> List[Dict[str, Any]]:
    """Random init. Returns params[layer][dir]['w_x'|'w_h'|'b'].

    Layer l, direction d:
      w_x [layer_input_dim, G*H], w_h [H, G*H], b [G*H]
    (the reference keeps one packed flat vector with per-gate Gaussian init,
    nnet-cudnn-component.cc:327-360; a structured pytree is equivalent and
    shardable).
    """
    g = _GATES[cfg.mode]
    params: List[Dict[str, Any]] = []
    for layer in range(cfg.num_layers):
        in_dim = cfg.layer_input_dim(layer)
        dirs = []
        for _ in range(cfg.num_directions):
            key, k1, k2, k3 = jax.random.split(key, 4)
            dirs.append({
                "w_x": cfg.param_stddev * jax.random.normal(
                    k1, (in_dim, g * cfg.hidden_dim), dtype=jnp.float32),
                "w_h": cfg.param_stddev * jax.random.normal(
                    k2, (cfg.hidden_dim, g * cfg.hidden_dim), dtype=jnp.float32),
                "b": cfg.bias_stddev * jax.random.normal(
                    k3, (g * cfg.hidden_dim,), dtype=jnp.float32),
            })
        params.append({"dirs": dirs})
    return params


def _rec_matmul(h, w_h):
    # operands in w_h's dtype, f32 accumulation — the same contract as
    # the Pallas kernels, so XLA-scan and Pallas paths agree bit-wise
    # in bfloat16 mode too
    return jnp.dot(h.astype(w_h.dtype), w_h,
                   preferred_element_type=jnp.float32)


def _lstm_cell(h, c, x_proj, w_h):
    gates = x_proj + _rec_matmul(h, w_h)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _gru_cell(h, x_proj, w_h, hidden_dim):
    # cuDNN linear-before-reset GRU: recurrent projection computed once,
    # reset gate applied to the candidate's recurrent term.
    h_proj = _rec_matmul(h, w_h)
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _elementwise_cell(h, x_proj, w_h, act):
    return act(x_proj + _rec_matmul(h, w_h))


def _run_direction(
    x: jnp.ndarray,            # [T, B, D_in]
    lens: Optional[jnp.ndarray],  # [B] or None
    p: Dict[str, Any],
    cfg: RnnConfig,
    reverse: bool,
) -> jnp.ndarray:
    t_max, b, _ = x.shape
    h_dim = cfg.hidden_dim
    mode = cfg.mode

    bf16 = cfg.compute_dtype == "bfloat16"
    cd = jnp.bfloat16 if bf16 else jnp.float32

    # hoisted input projection: one big MXU matmul over all frames
    # (bf16 operands, f32 accumulation in mixed-precision mode; the
    # result is STORED in the compute dtype — the same quantization the
    # Pallas layer applies, so scan/pallas/streaming agree in bf16 mode)
    x_proj = (jnp.dot(x.reshape(t_max * b, -1).astype(cd),
                      p["w_x"].astype(cd),
                      preferred_element_type=jnp.float32)
              + p["b"]).astype(cd).reshape(t_max, b, -1)

    if lens is None:
        lens = jnp.full((b,), t_max, dtype=jnp.int32)

    impl = cfg.implementation
    if impl == "auto":
        impl = ("pallas" if (mode in (RnnMode.LSTM, RnnMode.GRU)
                             and jax.default_backend() == "tpu") else "xla")
    if impl == "pallas" and mode == RnnMode.LSTM:
        # master-precision w_h: the sequence vjp casts internally so the
        # weight cotangent stays f32 (no bf16 dW quantization)
        from kaldi_ctc_tpu.ops.rnn_pallas import lstm_sequence
        return lstm_sequence(x_proj, p["w_h"], lens, reverse)
    if impl == "pallas" and mode == RnnMode.GRU:
        from kaldi_ctc_tpu.ops.gru_pallas import gru_sequence
        return gru_sequence(x_proj, p["w_h"], lens, reverse)
    w_h = p["w_h"].astype(cd)

    valid = (jnp.arange(t_max)[:, None] < lens[None, :])[..., None]  # [T,B,1]

    if mode == RnnMode.LSTM:
        def step(carry, inp):
            h, c = carry
            xp, v = inp
            h_new, c_new = _lstm_cell(h, c, xp, w_h)
            h_new = jnp.where(v, h_new, h)
            c_new = jnp.where(v, c_new, c)
            return (h_new, c_new), jnp.where(v, h_new, 0.0)
        init = (jnp.zeros((b, h_dim), jnp.float32),
                jnp.zeros((b, h_dim), jnp.float32))
    elif mode == RnnMode.GRU:
        def step(h, inp):
            xp, v = inp
            h_new = _gru_cell(h, xp, w_h, h_dim)
            h_new = jnp.where(v, h_new, h)
            return h_new, jnp.where(v, h_new, 0.0)
        init = jnp.zeros((b, h_dim), jnp.float32)
    else:
        act = jax.nn.relu if mode == RnnMode.RELU else jnp.tanh
        def step(h, inp):
            xp, v = inp
            h_new = _elementwise_cell(h, xp, w_h, act)
            h_new = jnp.where(v, h_new, h)
            return h_new, jnp.where(v, h_new, 0.0)
        init = jnp.zeros((b, h_dim), jnp.float32)

    xs = (x_proj, valid)
    _, ys = jax.lax.scan(step, init, xs, reverse=reverse)
    return ys.astype(cd)  # [T, B, H], layer output in the compute dtype


def rnn_forward(
    params: List[Dict[str, Any]],
    x: jnp.ndarray,
    cfg: RnnConfig,
    input_lens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the full stack. x: [T, B, input_dim] → [T, B, H*num_directions]."""
    out = x
    impl = cfg.implementation
    if impl == "auto":
        impl = ("pallas" if (cfg.mode in (RnnMode.LSTM, RnnMode.GRU)
                             and jax.default_backend() == "tpu") else "xla")
    fuse_bi = (cfg.bidirectional
               and cfg.mode in (RnnMode.LSTM, RnnMode.GRU)
               and impl == "pallas")
    for layer_params in params:
        dirs = layer_params["dirs"]
        if fuse_bi:
            out = _run_birnn_fused(out, input_lens, dirs, cfg)
        else:
            fwd = _run_direction(out, input_lens, dirs[0], cfg,
                                 reverse=False)
            if cfg.bidirectional:
                bwd = _run_direction(out, input_lens, dirs[1], cfg,
                                     reverse=True)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
    return out


def _run_birnn_fused(x, input_lens, dirs, cfg: RnnConfig) -> jnp.ndarray:
    """Both B(LSTM|GRU) directions through one fused Pallas kernel pass,
    with the two input projections merged into a single MXU matmul."""
    t_max, b, _ = x.shape
    cd = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32)
    lens = (input_lens if input_lens is not None
            else jnp.full((b,), t_max, dtype=jnp.int32))
    w_x = jnp.concatenate([dirs[0]["w_x"], dirs[1]["w_x"]], axis=1)
    bias = jnp.concatenate([dirs[0]["b"], dirs[1]["b"]])
    # the projection lives inside the layer's custom VJP so the fused
    # [T,B,2*gates*H] result reaches the kernel as block-spec views
    # (no per-direction split copy in either pass)
    if cfg.mode == RnnMode.LSTM:
        from kaldi_ctc_tpu.ops.rnn_pallas import bilstm_layer as bi_layer
    else:
        from kaldi_ctc_tpu.ops.gru_pallas import bigru_layer as bi_layer
    # params pass in master precision; the compute-dtype cast lives
    # inside the layer's custom vjp so weight cotangents come back f32
    y_f, y_b = bi_layer(x, w_x, bias, dirs[0]["w_h"], dirs[1]["w_h"],
                        lens, False, cfg.compute_dtype)
    return jnp.concatenate([y_f, y_b], axis=-1)


# ---------------------------------------------------------------------------
# Streaming (state-carrying) forward — unidirectional stacks only
# ---------------------------------------------------------------------------

def init_stream_state(cfg: RnnConfig, batch: int) -> List[Any]:
    """Zero carry state per layer: (h, c) for LSTM, h otherwise."""
    if cfg.bidirectional:
        raise ValueError("streaming requires a unidirectional stack")
    states: List[Any] = []
    for _ in range(cfg.num_layers):
        h = jnp.zeros((batch, cfg.hidden_dim), jnp.float32)
        if cfg.mode == RnnMode.LSTM:
            states.append((h, jnp.zeros((batch, cfg.hidden_dim),
                                        jnp.float32)))
        else:
            states.append(h)
    return states


def rnn_forward_stream(
    params: List[Dict[str, Any]],
    x: jnp.ndarray,                 # [T, B, input_dim] (one chunk)
    cfg: RnnConfig,
    states: List[Any],
    lens: Optional[jnp.ndarray] = None,   # [B] valid frames this chunk
) -> tuple:
    """Chunked forward with explicit carry — the online-decoding analogue
    of the reference's AdvanceDecoding-style incremental processing
    (decoder/lattice-faster-online-decoder.h): feeding chunks with the
    carried state is exactly equivalent to one full-utterance forward.

    With `lens`, frames >= lens[b] neither update stream b's state nor
    produce output (batched serving: slots with short final chunks).

    → (y [T, B, H], new_states)."""
    if cfg.bidirectional:
        raise ValueError("streaming requires a unidirectional stack")
    t_max, b, _ = x.shape
    h_dim = cfg.hidden_dim
    # same compute dtype as the offline rnn_forward, so chunked serving
    # of a bfloat16 model matches the full-utterance forward exactly
    cd = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
          else jnp.float32)
    impl = cfg.implementation
    if impl == "auto":
        impl = ("pallas" if (cfg.mode == RnnMode.LSTM
                             and jax.default_backend() == "tpu") else "xla")
    if (impl == "pallas" and cfg.mode == RnnMode.LSTM
            and cfg.num_layers > 1):
        from kaldi_ctc_tpu.ops.rnn_pallas import (
            lstm_stack_fwd, stack_weights_fit_vmem)
        if stack_weights_fit_vmem(cfg.num_layers, h_dim,
                                  jnp.dtype(cd).itemsize):
            # wavefront path: ALL layers in one grid of T + L - 1 steps
            # (vs L*T serial steps layer-by-layer) — the serial-step-
            # latency lever ROOFLINE.md identifies, available here
            # because unidirectional stacks have wavefront (not
            # barrier) layer dependencies
            xp0 = (jnp.dot(x.reshape(t_max * b, -1).astype(cd),
                           params[0]["dirs"][0]["w_x"].astype(cd),
                           preferred_element_type=jnp.float32)
                   + params[0]["dirs"][0]["b"]).astype(cd).reshape(
                       t_max, b, -1)
            wxs = [p["dirs"][0]["w_x"].astype(cd) for p in params[1:]]
            whs = [p["dirs"][0]["w_h"].astype(cd) for p in params]
            bs = [p["dirs"][0]["b"] for p in params[1:]]
            clens = (lens if lens is not None
                     else jnp.full((b,), t_max, dtype=jnp.int32))
            h0 = jnp.stack([st[0] for st in states])
            c0 = jnp.stack([st[1] for st in states])
            y, h_fin, c_fin = lstm_stack_fwd(xp0, wxs, whs, bs, clens,
                                             h0, c0)
            return y, [(h_fin[i], c_fin[i])
                       for i in range(cfg.num_layers)]
    valid = (None if lens is None else
             (jnp.arange(t_max)[:, None] < lens[None, :])[..., None])
    out = x
    new_states: List[Any] = []
    for layer_params, st in zip(params, states):
        p = layer_params["dirs"][0]
        x_proj = (jnp.dot(out.reshape(t_max * b, -1).astype(cd),
                          p["w_x"].astype(cd),
                          preferred_element_type=jnp.float32)
                  + p["b"]).astype(cd).reshape(t_max, b, -1)
        w_h = p["w_h"].astype(cd)
        if cfg.mode == RnnMode.LSTM:
            def step(carry, inp):
                h, c = carry
                xp, v = inp
                h_new, c_new = _lstm_cell(h, c, xp, w_h)
                if v is not None:
                    h_new = jnp.where(v, h_new, h)
                    c_new = jnp.where(v, c_new, c)
                    # invalid frames produce no output (the documented
                    # contract), only a carried state
                    return (h_new, c_new), jnp.where(v, h_new, 0.0)
                return (h_new, c_new), h_new
        elif cfg.mode == RnnMode.GRU:
            def step(h, inp):
                xp, v = inp
                h_new = _gru_cell(h, xp, w_h, h_dim)
                if v is not None:
                    h_new = jnp.where(v, h_new, h)
                    return h_new, jnp.where(v, h_new, 0.0)
                return h_new, h_new
        else:
            act = jax.nn.relu if cfg.mode == RnnMode.RELU else jnp.tanh
            def step(h, inp):
                xp, v = inp
                h_new = _elementwise_cell(h, xp, w_h, act)
                if v is not None:
                    h_new = jnp.where(v, h_new, h)
                    return h_new, jnp.where(v, h_new, 0.0)
                return h_new, h_new
        xs = (x_proj, valid)
        st_new, ys = jax.lax.scan(step, st, xs)
        new_states.append(st_new)
        out = ys.astype(cd)  # layer output in the compute dtype
    return out, new_states
