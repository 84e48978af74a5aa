"""Pallas fused GRU sequence kernels (cuDNN linear-before-reset variant).

Companion to rnn_pallas.py's LSTM kernels, covering rnn-mode 3 of the
reference's cuDNN wrapper (``cudamatrix/cudnn-recurrent.h:17-140``,
``CUDNN_GRU``).  Same structure: the input projection is hoisted into one
large XLA matmul; these kernels run the sequential recurrence with h
resident in VMEM scratch across the time grid.

Cell (linear-before-reset, matching ops.rnn._gru_cell):
  (hr, hz, hn) = h @ W_h          (one [H, 3H] MXU matmul)
  r = sigmoid(xr + hr);  z = sigmoid(xz + hz);  n = tanh(xn + r * hn)
  h' = (1 - z) * n + z * h

Backward subtlety: the cotangent w.r.t. x_proj's n-block is dn̂ while the
recurrent projection's n-block receives dn̂ * r — the backward kernel
therefore emits two gate tensors (dgates_x for the x_proj cotangent,
dgates_h for the dW_h matmul and the dh carry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_ctc_tpu.ops.rnn_pallas import _shift_prev, _time_spec

__all__ = ["gru_sequence", "gru_seq_fwd", "bigru_sequence"]


def _fwd_kernel(lens_ref, xp_ref, wh_ref, y_ref, rzn_ref, hn_ref,
                h_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    t = (t_max - 1 - step) if reverse else step

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    h_proj = jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                     preferred_element_type=jnp.float32)
    hdim = h.shape[-1]
    xp = xp_ref[0]
    r = jax.nn.sigmoid(xp[:, 0 * hdim:1 * hdim] + h_proj[:, 0 * hdim:1 * hdim])
    z = jax.nn.sigmoid(xp[:, 1 * hdim:2 * hdim] + h_proj[:, 1 * hdim:2 * hdim])
    hn = h_proj[:, 2 * hdim:3 * hdim]
    n = jnp.tanh(xp[:, 2 * hdim:3 * hdim] + r * hn)
    h_new = (1.0 - z) * n + z * h

    valid = lens_ref[:] > t
    h_out = jnp.where(valid, h_new, h)
    h_scr[:] = h_out
    y_ref[0] = jnp.where(valid, h_new, 0.0)
    rzn_ref[0] = jnp.concatenate([r, z, n], axis=-1)
    hn_ref[0] = hn


def _bwd_kernel(lens_ref, dy_ref, rzn_ref, hn_ref, hprev_ref, wh_t_ref,
                dgx_ref, dgh_ref, dh_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    t = step if reverse else (t_max - 1 - step)

    @pl.when(step == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    hdim = dh_scr.shape[-1]
    rzn = rzn_ref[0]
    r = rzn[:, 0 * hdim:1 * hdim]
    z = rzn[:, 1 * hdim:2 * hdim]
    n = rzn[:, 2 * hdim:3 * hdim]
    hn = hn_ref[0]
    h_prev = hprev_ref[0]

    dh_total = dy_ref[0] + dh_scr[:]
    dn_hat = dh_total * (1.0 - z) * (1.0 - n * n)   # d a_n
    dz_hat = dh_total * (h_prev - n) * z * (1.0 - z)  # d a_z
    dr_hat = dn_hat * hn * r * (1.0 - r)            # d a_r
    dgx = jnp.concatenate([dr_hat, dz_hat, dn_hat], axis=-1)
    dgh = jnp.concatenate([dr_hat, dz_hat, dn_hat * r], axis=-1)

    valid = lens_ref[:] > t
    dgx = jnp.where(valid, dgx, 0.0)
    dgh = jnp.where(valid, dgh, 0.0)
    dh_new = jnp.dot(dgh.astype(wh_t_ref.dtype), wh_t_ref[:],
                     preferred_element_type=jnp.float32) + dh_total * z
    dh_scr[:] = jnp.where(valid, dh_new, dh_scr[:])
    dgx_ref[0] = dgx
    dgh_ref[0] = dgh


def _gru_cell_update(xp, wh_ref, h, valid):
    """One GRU step → (h_out, y, rzn, hn)."""
    h_proj = jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                     preferred_element_type=jnp.float32)
    hdim = h.shape[-1]
    r = jax.nn.sigmoid(xp[:, 0 * hdim:1 * hdim]
                       + h_proj[:, 0 * hdim:1 * hdim])
    z = jax.nn.sigmoid(xp[:, 1 * hdim:2 * hdim]
                       + h_proj[:, 1 * hdim:2 * hdim])
    hn = h_proj[:, 2 * hdim:3 * hdim]
    n = jnp.tanh(xp[:, 2 * hdim:3 * hdim] + r * hn)
    h_new = (1.0 - z) * n + z * h
    return (jnp.where(valid, h_new, h), jnp.where(valid, h_new, 0.0),
            jnp.concatenate([r, z, n], axis=-1), hn)


def _bifwd_kernel(lens_ref, xpf_ref, xpb_ref, whf_ref, whb_ref,
                  yf_ref, rznf_ref, hnf_ref, yb_ref, rznb_ref, hnb_ref,
                  hf_scr, hb_scr, *, t_max: int):
    """Both BGRU directions in one sequential grid (the bilstm idiom)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)

    h, y, rzn, hn = _gru_cell_update(xpf_ref[0], whf_ref, hf_scr[:],
                                     lens_ref[:] > step)
    hf_scr[:] = h
    yf_ref[0] = y
    rznf_ref[0] = rzn
    hnf_ref[0] = hn

    h, y, rzn, hn = _gru_cell_update(xpb_ref[0], whb_ref, hb_scr[:],
                                     lens_ref[:] > (t_max - 1 - step))
    hb_scr[:] = h
    yb_ref[0] = y
    rznb_ref[0] = rzn
    hnb_ref[0] = hn


def _dgru_update(dy, rzn, hn, h_prev, wh_t_ref, dh, valid):
    """One backward GRU step → (dgx, dgh, dh_new)."""
    hdim = dh.shape[-1]
    r = rzn[:, 0 * hdim:1 * hdim]
    z = rzn[:, 1 * hdim:2 * hdim]
    n = rzn[:, 2 * hdim:3 * hdim]
    dh_total = dy + dh
    dn_hat = dh_total * (1.0 - z) * (1.0 - n * n)
    dz_hat = dh_total * (h_prev - n) * z * (1.0 - z)
    dr_hat = dn_hat * hn * r * (1.0 - r)
    dgx = jnp.concatenate([dr_hat, dz_hat, dn_hat], axis=-1)
    dgh = jnp.concatenate([dr_hat, dz_hat, dn_hat * r], axis=-1)
    dgx = jnp.where(valid, dgx, 0.0)
    dgh = jnp.where(valid, dgh, 0.0)
    dh_new = jnp.dot(dgh.astype(wh_t_ref.dtype), wh_t_ref[:],
                     preferred_element_type=jnp.float32) + dh_total * z
    return dgx, dgh, jnp.where(valid, dh_new, dh)


def _bibwd_kernel(lens_ref, dyf_ref, rznf_ref, hnf_ref, hpf_ref,
                  dyb_ref, rznb_ref, hnb_ref, hpb_ref,
                  whf_t_ref, whb_t_ref,
                  dgxf_ref, dghf_ref, dgxb_ref, dghb_ref,
                  dhf_scr, dhb_scr, *, t_max: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dhb_scr[:] = jnp.zeros_like(dhb_scr)

    dgx, dgh, dh = _dgru_update(dyf_ref[0], rznf_ref[0], hnf_ref[0],
                                hpf_ref[0], whf_t_ref, dhf_scr[:],
                                lens_ref[:] > (t_max - 1 - step))
    dhf_scr[:] = dh
    dgxf_ref[0] = dgx
    dghf_ref[0] = dgh

    dgx, dgh, dh = _dgru_update(dyb_ref[0], rznb_ref[0], hnb_ref[0],
                                hpb_ref[0], whb_t_ref, dhb_scr[:],
                                lens_ref[:] > step)
    dhb_scr[:] = dh
    dgxb_ref[0] = dgx
    dghb_ref[0] = dgh


def gru_seq_fwd(x_proj, w_h, lens, reverse=False, interpret=False):
    """Forward GRU over a full sequence.

    x_proj: [T, B, 3H] input projection (+bias); w_h: [H, 3H].
    Returns (y, rzn_seq, hn_seq) — residuals for the backward pass."""
    t_max, b, g3 = x_proj.shape
    h = g3 // 3
    kern = functools.partial(_fwd_kernel, t_max=t_max, reverse=reverse)
    y, rzn, hn = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            _time_spec(t_max, reverse, (1, b, g3)),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            _time_spec(t_max, reverse, (1, b, h)),
            _time_spec(t_max, reverse, (1, b, g3)),
            _time_spec(t_max, reverse, (1, b, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g3), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], x_proj, w_h)
    return y, rzn, hn


def _gru_seq_bwd_dgates(dy, rzn_seq, hn_seq, h_prev_seq, w_h, lens,
                        reverse=False, interpret=False):
    t_max, b, h = dy.shape
    g3 = 3 * h
    kern = functools.partial(_bwd_kernel, t_max=t_max, reverse=reverse)
    rev_order = not reverse
    dgx, dgh = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            _time_spec(t_max, rev_order, (1, b, h)),    # dy
            _time_spec(t_max, rev_order, (1, b, g3)),   # rzn
            _time_spec(t_max, rev_order, (1, b, h)),    # hn
            _time_spec(t_max, rev_order, (1, b, h)),    # h_prev
            pl.BlockSpec((g3, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),      # w_h^T
        ],
        out_specs=[
            _time_spec(t_max, rev_order, (1, b, g3)),
            _time_spec(t_max, rev_order, (1, b, g3)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, g3), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g3), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], dy, rzn_seq, hn_seq, h_prev_seq,
      w_h.T)
    return dgx, dgh


def _bigru_seq_fwd(xp_f, xp_b, w_h_f, w_h_b, lens, interpret=False):
    t_max, b, g3 = xp_f.shape
    h = g3 // 3
    kern = functools.partial(_bifwd_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, False)
    bw = functools.partial(_time_spec, t_max, True)
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            fw((1, b, g3)), bw((1, b, g3)),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[fw((1, b, h)), fw((1, b, g3)), fw((1, b, h)),
                   bw((1, b, h)), bw((1, b, g3)), bw((1, b, h))],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g3), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g3), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 2,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], xp_f, xp_b, w_h_f, w_h_b)


def _bigru_seq_bwd_dgates(dy_f, dy_b, rzn_f, hn_f, hp_f, rzn_b, hn_b,
                          hp_b, w_h_f, w_h_b, lens, interpret=False):
    t_max, b, h = dy_f.shape
    g3 = 3 * h
    kern = functools.partial(_bibwd_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, True)   # fwd dir reversed
    bw = functools.partial(_time_spec, t_max, False)  # bwd dir forward
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            fw((1, b, h)), fw((1, b, g3)), fw((1, b, h)), fw((1, b, h)),
            bw((1, b, h)), bw((1, b, g3)), bw((1, b, h)), bw((1, b, h)),
            pl.BlockSpec((g3, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g3, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[fw((1, b, g3)), fw((1, b, g3)),
                   bw((1, b, g3)), bw((1, b, g3))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g3), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 2,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], dy_f, rzn_f, hn_f, hp_f,
      dy_b, rzn_b, hn_b, hp_b, w_h_f.T, w_h_b.T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bigru_sequence(xp_f, xp_b, w_h_f, w_h_b, lens, interpret=False):
    """Fused bidirectional GRU layer → (y_f, y_b)."""
    outs = _bigru_seq_fwd(xp_f, xp_b, w_h_f, w_h_b, lens, interpret)
    return outs[0], outs[3]


def _bigru_fwd(xp_f, xp_b, w_h_f, w_h_b, lens, interpret):
    y_f, rzn_f, hn_f, y_b, rzn_b, hn_b = _bigru_seq_fwd(
        xp_f, xp_b, w_h_f, w_h_b, lens, interpret)
    return (y_f, y_b), (w_h_f, w_h_b, lens, y_f, rzn_f, hn_f,
                        y_b, rzn_b, hn_b)


def _bigru_bwd(interpret, res, cot):
    dy_f, dy_b = cot
    w_h_f, w_h_b, lens, y_f, rzn_f, hn_f, y_b, rzn_b, hn_b = res
    hp_f = _shift_prev(y_f, False)
    hp_b = _shift_prev(y_b, True)
    dgx_f, dgh_f, dgx_b, dgh_b = _bigru_seq_bwd_dgates(
        dy_f, dy_b, rzn_f, hn_f, hp_f, rzn_b, hn_b, hp_b,
        w_h_f, w_h_b, lens, interpret)
    t_max, b, h = y_f.shape
    dw_f = jnp.dot(hp_f.reshape(t_max * b, h).astype(w_h_f.dtype).T,
                   dgh_f.reshape(t_max * b, 3 * h).astype(w_h_f.dtype),
                   preferred_element_type=jnp.float32).astype(w_h_f.dtype)
    dw_b = jnp.dot(hp_b.reshape(t_max * b, h).astype(w_h_b.dtype).T,
                   dgh_b.reshape(t_max * b, 3 * h).astype(w_h_b.dtype),
                   preferred_element_type=jnp.float32).astype(w_h_b.dtype)
    return dgx_f, dgx_b, dw_f, dw_b, None


bigru_sequence.defvjp(_bigru_fwd, _bigru_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_sequence(x_proj, w_h, lens, reverse=False, interpret=False):
    """Differentiable fused GRU over a sequence → y [T, B, H]."""
    y, _, _ = gru_seq_fwd(x_proj, w_h, lens, reverse, interpret)
    return y


def _gru_sequence_fwd(x_proj, w_h, lens, reverse, interpret):
    y, rzn, hn = gru_seq_fwd(x_proj, w_h, lens, reverse, interpret)
    return y, (w_h, lens, y, rzn, hn)


def _gru_sequence_bwd(reverse, interpret, res, dy):
    w_h, lens, y, rzn, hn = res
    h_prev = _shift_prev(y, reverse)
    dgx, dgh = _gru_seq_bwd_dgates(dy, rzn, hn, h_prev, w_h, lens,
                                   reverse, interpret)
    t_max, b, h = y.shape
    dw_h = jnp.dot(
        h_prev.reshape(t_max * b, h).astype(w_h.dtype).T,
        dgh.reshape(t_max * b, 3 * h).astype(w_h.dtype),
        preferred_element_type=jnp.float32).astype(w_h.dtype)
    return dgx, dw_h, None


gru_sequence.defvjp(_gru_sequence_fwd, _gru_sequence_bwd)
