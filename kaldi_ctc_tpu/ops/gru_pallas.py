"""Pallas fused GRU sequence kernels (cuDNN linear-before-reset variant).

Companion to rnn_pallas.py's LSTM kernels, covering rnn-mode 3 of the
reference's cuDNN wrapper (``cudamatrix/cudnn-recurrent.h:17-140``,
``CUDNN_GRU``).  Same structure and the same HBM-bandwidth discipline
(these sequential kernels are DMA-bound, not compute-bound — see
rnn_pallas.py): the input projection is hoisted into one large XLA
matmul; the forward kernel writes only ``y``; the backward kernel
*recomputes* the gates from ``x_proj[t] + y[t-1] @ W_h`` (bit-identical
f32 ops — y[t-1] equals the h carry at every valid step) with y[t-1]
entering as a clamped block-spec view of ``y`` rather than a
materialized shift copy.

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

from kaldi_ctc_tpu.ops.rnn_pallas import (
    _bf16_cfg, _const_spec, _dw_h, _prev_spec, _split_spec, _time_spec,
    _zero_at)

__all__ = ["gru_sequence", "gru_seq_fwd", "bigru_layer"]


def _gru_gates(xp, h, wh_ref):
    """Activated (r, z, n, hn) from the stored projection and the
    previous output.  THE single definition of the gate computation:
    the forward cell and the backward recomputation both call this, so
    the recompute-instead-of-store bit-identity invariant holds by
    construction.  xp may be bf16-stored; gate math is f32 and h enters
    the matmul as the same cast-to-w_h-dtype operand in both passes."""
    h_proj = jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                     preferred_element_type=jnp.float32)
    xp = xp.astype(jnp.float32)
    hdim = wh_ref.shape[0]
    r = jax.nn.sigmoid(xp[:, 0 * hdim:1 * hdim]
                       + h_proj[:, 0 * hdim:1 * hdim])
    z = jax.nn.sigmoid(xp[:, 1 * hdim:2 * hdim]
                       + h_proj[:, 1 * hdim:2 * hdim])
    hn = h_proj[:, 2 * hdim:3 * hdim]
    n = jnp.tanh(xp[:, 2 * hdim:3 * hdim] + r * hn)
    return r, z, n, hn


def _gru_cell_update(xp, wh_ref, h, valid):
    """One GRU step → (h_out, y)."""
    r, z, n, _hn = _gru_gates(xp, h, wh_ref)
    h_new = (1.0 - z) * n + z * h
    return jnp.where(valid, h_new, h), jnp.where(valid, h_new, 0.0)


def _fwd_kernel(lens_ref, xp_ref, wh_ref, y_ref,
                h_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    t = (t_max - 1 - step) if reverse else step

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    valid = lens_ref[:] > t
    h, y = _gru_cell_update(xp_ref[0], wh_ref, h_scr[:], valid)
    h_scr[:] = h
    y_ref[0] = y.astype(y_ref.dtype)


def _dgru_update(dy, xp, hp, wh_ref, wh_t_ref, dh, valid):
    """One backward GRU step → (dgx, dgh, dh_new).

    Recomputes r/z/n/hn from the projection and the previous output
    (identical f32 ops to the forward pass)."""
    r, z, n, hn = _gru_gates(xp, hp, wh_ref)
    hp = hp.astype(jnp.float32)
    dy = dy.astype(jnp.float32)

    dh_total = dy + dh
    dn_hat = dh_total * (1.0 - z) * (1.0 - n * n)
    dz_hat = dh_total * (hp - n) * z * (1.0 - z)
    dr_hat = dn_hat * hn * r * (1.0 - r)
    dgx = jnp.concatenate([dr_hat, dz_hat, dn_hat], axis=-1)
    dgh = jnp.concatenate([dr_hat, dz_hat, dn_hat * r], axis=-1)
    dgx = jnp.where(valid, dgx, 0.0)
    dgh = jnp.where(valid, dgh, 0.0)
    dh_new = jnp.dot(dgh.astype(wh_t_ref.dtype), wh_t_ref[:],
                     preferred_element_type=jnp.float32) + dh_total * z
    return dgx, dgh, jnp.where(valid, dh_new, dh)


def _bwd_kernel(lens_ref, dy_ref, xp_ref, hp_ref, wh_ref, wh_t_ref,
                dgx_ref, dgh_ref, dh_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    t = step if reverse else (t_max - 1 - step)

    @pl.when(step == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    # the forward pass's first processed step has h_prev = 0
    first = step == t_max - 1
    hp = _zero_at(first, hp_ref[0])
    valid = lens_ref[:] > t
    dgx, dgh, dh = _dgru_update(dy_ref[0], xp_ref[0], hp, wh_ref,
                                wh_t_ref, dh_scr[:], valid)
    dh_scr[:] = dh
    dgx_ref[0] = dgx.astype(dgx_ref.dtype)
    dgh_ref[0] = dgh.astype(dgh_ref.dtype)


def _bifwd_kernel(lens_ref, xpf_ref, xpb_ref, whf_ref, whb_ref,
                  yf_ref, yb_ref, hf_scr, hb_scr, *, t_max: int):
    """Both BGRU directions in one sequential grid (the bilstm idiom)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)

    h, y = _gru_cell_update(xpf_ref[0], whf_ref, hf_scr[:],
                            lens_ref[:] > step)
    hf_scr[:] = h
    yf_ref[0] = y.astype(yf_ref.dtype)

    h, y = _gru_cell_update(xpb_ref[0], whb_ref, hb_scr[:],
                            lens_ref[:] > (t_max - 1 - step))
    hb_scr[:] = h
    yb_ref[0] = y.astype(yb_ref.dtype)


def _bibwd_kernel(lens_ref, dyf_ref, xpf_ref, hpf_ref,
                  dyb_ref, xpb_ref, hpb_ref,
                  whf_ref, whf_t_ref, whb_ref, whb_t_ref,
                  dgxf_ref, dghf_ref, dgxb_ref, dghb_ref,
                  dhf_scr, dhb_scr, *, t_max: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dhb_scr[:] = jnp.zeros_like(dhb_scr)

    # both directions hit their forward-first step at s == t_max-1
    first = step == t_max - 1

    hp = _zero_at(first, hpf_ref[0])
    dgx, dgh, dh = _dgru_update(dyf_ref[0], xpf_ref[0], hp, whf_ref,
                                whf_t_ref, dhf_scr[:],
                                lens_ref[:] > (t_max - 1 - step))
    dhf_scr[:] = dh
    dgxf_ref[0] = dgx.astype(dgxf_ref.dtype)
    dghf_ref[0] = dgh.astype(dghf_ref.dtype)

    hp = _zero_at(first, hpb_ref[0])
    dgx, dgh, dh = _dgru_update(dyb_ref[0], xpb_ref[0], hp, whb_ref,
                                whb_t_ref, dhb_scr[:],
                                lens_ref[:] > step)
    dhb_scr[:] = dh
    dgxb_ref[0] = dgx.astype(dgxb_ref.dtype)
    dghb_ref[0] = dgh.astype(dghb_ref.dtype)


def gru_seq_fwd(x_proj, w_h, lens, reverse=False, interpret=False):
    """Forward GRU over a full sequence → y [T, B, H].

    x_proj: [T, B, 3H] input projection (+bias); w_h: [H, 3H].
    The backward pass recomputes the gates, so y is the only residual."""
    t_max, b, g3 = x_proj.shape
    h = g3 // 3
    kern = functools.partial(_fwd_kernel, t_max=t_max, reverse=reverse)
    y = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            _time_spec(t_max, reverse, (1, b, g3)),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[_time_spec(t_max, reverse, (1, b, h))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, h), x_proj.dtype)],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], x_proj, w_h)
    return y[0] if isinstance(y, (list, tuple)) else y


def _gru_seq_bwd_dgates(dy, x_proj, y, w_h, lens,
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
            _time_spec(t_max, rev_order, (1, b, g3)),   # x_proj
            _prev_spec(t_max, rev_order, reverse, (1, b, h)),  # y[t∓1]
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),      # w_h
            pl.BlockSpec((g3, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),      # w_h^T
        ],
        out_specs=[
            _time_spec(t_max, rev_order, (1, b, g3)),
            _time_spec(t_max, rev_order, (1, b, g3)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, g3), x_proj.dtype),
            jax.ShapeDtypeStruct((t_max, b, g3), x_proj.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], dy, x_proj, y, w_h, w_h.T)
    return dgx, dgh


def _bigru_seq_fwd(xp, w_h_f, w_h_b, lens, interpret=False,
                   y_dtype=None):
    """xp: fused [T, B, 2*3H] projection (fwd-direction half first)."""
    t_max, b, g6 = xp.shape
    g3 = g6 // 2
    h = g3 // 3
    y_dtype = xp.dtype if y_dtype is None else y_dtype
    kern = functools.partial(_bifwd_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, False)
    bw = functools.partial(_time_spec, t_max, True)
    if g3 % 128 == 0:
        xp_f = xp_b = xp
        spec_f = _split_spec(t_max, False, 0, (1, b, g3))
        spec_b = _split_spec(t_max, True, 1, (1, b, g3))
    else:
        xp_f, xp_b = xp[..., :g3], xp[..., g3:]
        spec_f, spec_b = fw((1, b, g3)), bw((1, b, g3))
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            spec_f, spec_b,
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[fw((1, b, h)), bw((1, b, h))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, h), y_dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 2,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], xp_f, xp_b, w_h_f, w_h_b)


def _bigru_seq_bwd_dgates(dy_f, dy_b, xp, y_f, y_b,
                          w_h_f, w_h_b, lens, interpret=False,
                          dg_dtype=None):
    t_max, b, h = dy_f.shape
    g3 = 3 * h
    dg_dtype = xp.dtype if dg_dtype is None else dg_dtype
    kern = functools.partial(_bibwd_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, True)   # fwd dir reversed
    bw = functools.partial(_time_spec, t_max, False)  # bwd dir forward
    fwp = functools.partial(_prev_spec, t_max, True, False)   # y_f[t-1]
    bwp = functools.partial(_prev_spec, t_max, False, True)   # y_b[t+1]
    if g3 % 128 == 0:
        xp_f = xp_b = xp
        spec_f = _split_spec(t_max, True, 0, (1, b, g3))
        spec_b = _split_spec(t_max, False, 1, (1, b, g3))
    else:
        xp_f, xp_b = xp[..., :g3], xp[..., g3:]
        spec_f, spec_b = fw((1, b, g3)), bw((1, b, g3))
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            fw((1, b, h)), spec_f, fwp((1, b, h)),
            bw((1, b, h)), spec_b, bwp((1, b, h)),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g3, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g3), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g3, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[fw((1, b, g3)), fw((1, b, g3)),
                   bw((1, b, g3)), bw((1, b, g3))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g3), dg_dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 2,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], dy_f, xp_f, y_f,
      dy_b, xp_b, y_b, w_h_f, w_h_f.T, w_h_b, w_h_b.T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def bigru_layer(x, w_x, bias, w_h_f, w_h_b, lens, interpret=False,
                compute_dtype="float32"):
    """Full fused bidirectional GRU layer → (y_f, y_b), each [T, B, H].

    Mirrors rnn_pallas.bilstm_layer: one MXU matmul projects both
    directions (``w_x = [w_x_fwd | w_x_bwd]``, [D, 2*3H]); the fused
    projection reaches the kernels as zero-copy views when 3H is
    lane-aligned; backward recomputes gates and folds dgates into
    dx / dW_x with per-direction matmuls."""
    y_f, y_b, _ = _bigru_layer_fwd_impl(x, w_x, bias, w_h_f, w_h_b,
                                        lens, interpret, compute_dtype)
    return y_f, y_b


def _bigru_layer_fwd_impl(x, w_x, bias, w_h_f, w_h_b, lens, interpret,
                          compute_dtype="float32"):
    t_max, b, d = x.shape
    cdt, xp_dt, y_dt, _, _ = _bf16_cfg(compute_dtype)
    # master-precision params; compute-dtype casts live inside the vjp
    # (see rnn_pallas._bilstm_layer_fwd_impl)
    wx_c = w_x.astype(cdt)
    xp = (jnp.dot(x.reshape(t_max * b, d).astype(cdt), wx_c,
                  preferred_element_type=jnp.float32)
          + bias).astype(xp_dt).reshape(t_max, b, -1)
    y_f, y_b = _bigru_seq_fwd(xp, w_h_f.astype(cdt), w_h_b.astype(cdt),
                              lens, interpret, y_dtype=y_dt)
    return y_f, y_b, xp


def _bigru_layer_fwd(x, w_x, bias, w_h_f, w_h_b, lens, interpret,
                     compute_dtype):
    y_f, y_b, xp = _bigru_layer_fwd_impl(
        x, w_x, bias, w_h_f, w_h_b, lens, interpret, compute_dtype)
    return (y_f, y_b), (x, w_x, w_h_f, w_h_b, lens, xp, y_f, y_b)


def _bigru_layer_bwd(interpret, compute_dtype, res, cot):
    dy_f, dy_b = cot
    x, w_x, w_h_f, w_h_b, lens, xp, y_f, y_b = res
    cdt, _, _, dg_dt, wop = _bf16_cfg(compute_dtype)
    wx_c = w_x.astype(cdt)
    dgx_f, dgh_f, dgx_b, dgh_b = _bigru_seq_bwd_dgates(
        dy_f, dy_b, xp, y_f, y_b, w_h_f.astype(cdt), w_h_b.astype(cdt),
        lens, interpret, dg_dtype=dg_dt)
    t_max, b, h = y_f.shape
    g3 = 3 * h
    d = x.shape[-1]
    x2 = x.reshape(t_max * b, d)
    dgxf2 = dgx_f.reshape(t_max * b, g3)
    dgxb2 = dgx_b.reshape(t_max * b, g3)
    # f32-emitted weight grads against f32 master params (see
    # rnn_pallas._bilstm_layer_bwd)
    dw_f = _dw_h(y_f, dgh_f, False, wop)
    dw_b = _dw_h(y_b, dgh_b, True, wop)
    wx_op = w_x if wop == jnp.float32 else wx_c
    dx = (jnp.dot(dgxf2.astype(wop), wx_op[:, :g3].T,
                  preferred_element_type=jnp.float32)
          + jnp.dot(dgxb2.astype(wop), wx_op[:, g3:].T,
                    preferred_element_type=jnp.float32))
    dx = dx.astype(x.dtype).reshape(t_max, b, d)
    dw_x = jnp.concatenate(
        [jnp.dot(x2.astype(wop).T, dgxf2.astype(wop),
                 preferred_element_type=jnp.float32),
         jnp.dot(x2.astype(wop).T, dgxb2.astype(wop),
                 preferred_element_type=jnp.float32)],
        axis=1)
    dbias = jnp.concatenate([dgxf2.sum(axis=0, dtype=jnp.float32),
                             dgxb2.sum(axis=0, dtype=jnp.float32)])
    return dx, dw_x, dbias, dw_f, dw_b, None


bigru_layer.defvjp(_bigru_layer_fwd, _bigru_layer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_sequence(x_proj, w_h, lens, reverse=False, interpret=False):
    """Differentiable fused GRU over a sequence → y [T, B, H].

    w_h may arrive in master precision (f32); the cast to x_proj's
    compute dtype lives inside the vjp so the weight cotangent keeps
    the master dtype (see rnn_pallas.lstm_sequence)."""
    return gru_seq_fwd(x_proj, w_h.astype(x_proj.dtype), lens, reverse,
                       interpret)


def _gru_sequence_fwd(x_proj, w_h, lens, reverse, interpret):
    y = gru_seq_fwd(x_proj, w_h.astype(x_proj.dtype), lens, reverse,
                    interpret)
    return y, (x_proj, w_h, lens, y)


def _gru_sequence_bwd(reverse, interpret, res, dy):
    x_proj, w_h, lens, y = res
    cdt = x_proj.dtype
    dgx, dgh = _gru_seq_bwd_dgates(dy, x_proj, y, w_h.astype(cdt), lens,
                                   reverse, interpret)
    dw_h = _dw_h(y, dgh, reverse, cdt, out_dtype=w_h.dtype)
    return dgx, dw_h, None


gru_sequence.defvjp(_gru_sequence_fwd, _gru_sequence_bwd)
