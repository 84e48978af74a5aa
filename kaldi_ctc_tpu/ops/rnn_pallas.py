"""Pallas fused LSTM sequence kernels.

The TPU-native replacement for the cuDNN RNN kernel surface
(``cudamatrix/cudnn-recurrent.h:17-140``).  The input projection
``x @ W_x + b`` is hoisted into one large XLA matmul (MXU-saturating);
these kernels implement the *sequential* part — the per-timestep recurrent
matmul + gate fusion — with the hidden/cell state resident in VMEM scratch
that persists across the (sequential) TPU grid steps, so the recurrence
never round-trips HBM:

- forward: grid=(T,), per step ``gates = x_proj[t] + h @ W_h`` on the MXU
  followed by fused VPU gate math; activated gates and cell states are
  written out as residuals for the backward pass;
- backward: same structure in reverse, producing d(gates); the weight
  gradients ``dW_h = h_prevᵀ·dgates`` / ``dW_x = xᵀ·dgates`` are again
  large XLA matmuls outside the kernel.

Direction is handled by index arithmetic (reverse=True flips the time
index map), so backward-direction BLSTM layers reuse the same kernels.
Length masking matches ops.rnn: state carries across pad frames, outputs
there are zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_sequence", "lstm_seq_fwd", "bilstm_sequence"]


def _fwd_kernel(lens_ref, xp_ref, wh_ref, y_ref, c_ref, gates_ref,
                h_scr, c_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    t = (t_max - 1 - step) if reverse else step

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    gates = xp_ref[0] + jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                                preferred_element_type=jnp.float32)
    hdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * hdim:1 * hdim])
    f = jax.nn.sigmoid(gates[:, 1 * hdim:2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim:4 * hdim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    valid = lens_ref[:] > t  # [B, 1] float lengths in VMEM
    h_out = jnp.where(valid, h_new, h)
    c_out = jnp.where(valid, c_new, c)
    h_scr[:] = h_out
    c_scr[:] = c_out
    y_ref[0] = jnp.where(valid, h_new, 0.0)
    c_ref[0] = c_out
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)


def _bwd_kernel(lens_ref, dy_ref, gates_ref, c_ref, cprev_ref, wh_t_ref,
                dgates_ref, dh_scr, dc_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    # walk time in the opposite order of the forward pass
    t = step if reverse else (t_max - 1 - step)

    @pl.when(step == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    hdim = dh_scr.shape[-1]
    gates = gates_ref[0]
    i = gates[:, 0 * hdim:1 * hdim]
    f = gates[:, 1 * hdim:2 * hdim]
    g = gates[:, 2 * hdim:3 * hdim]
    o = gates[:, 3 * hdim:4 * hdim]
    c = c_ref[0]
    c_prev = cprev_ref[0]
    tanh_c = jnp.tanh(c)

    dh_total = dy_ref[0] + dh_scr[:]
    dc_total = dc_scr[:] + dh_total * o * (1.0 - tanh_c * tanh_c)
    do = dh_total * tanh_c * o * (1.0 - o)
    di = dc_total * g * i * (1.0 - i)
    df = dc_total * c_prev * f * (1.0 - f)
    dg = dc_total * i * (1.0 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)

    valid = lens_ref[:] > t
    dgates = jnp.where(valid, dgates, 0.0)
    dh_new = jnp.dot(dgates.astype(wh_t_ref.dtype), wh_t_ref[:],
                     preferred_element_type=jnp.float32)
    # carry: valid step consumes dh/dc; invalid passes them through
    dh_scr[:] = jnp.where(valid, dh_new, dh_scr[:])
    dc_scr[:] = jnp.where(valid, dc_total * f, dc_scr[:])
    dgates_ref[0] = dgates


def _lstm_cell_update(xp, wh_ref, h, c, valid):
    """One LSTM cell step; returns (h_out, c_out, y, gates)."""
    gates = xp + jnp.dot(h.astype(wh_ref.dtype), wh_ref[:],
                         preferred_element_type=jnp.float32)
    hdim = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * hdim:1 * hdim])
    f = jax.nn.sigmoid(gates[:, 1 * hdim:2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim:4 * hdim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_out = jnp.where(valid, h_new, h)
    c_out = jnp.where(valid, c_new, c)
    return h_out, c_out, jnp.where(valid, h_new, 0.0), \
        jnp.concatenate([i, f, g, o], axis=-1)


def _bifwd_kernel(lens_ref, xpf_ref, xpb_ref, whf_ref, whb_ref,
                  yf_ref, cf_ref, gf_ref, yb_ref, cb_ref, gb_ref,
                  hf_scr, cf_scr, hb_scr, cb_scr, *, t_max: int):
    """Both BLSTM directions in one sequential grid: step s advances the
    forward direction at t=s and the backward direction at t=t_max-1-s.
    The directions are independent, so one pass of T steps replaces two
    back-to-back T-step kernels."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)
        cb_scr[:] = jnp.zeros_like(cb_scr)

    valid_f = lens_ref[:] > step
    h, c, y, g = _lstm_cell_update(xpf_ref[0], whf_ref, hf_scr[:],
                                   cf_scr[:], valid_f)
    hf_scr[:] = h
    cf_scr[:] = c
    yf_ref[0] = y
    cf_ref[0] = c
    gf_ref[0] = g

    valid_b = lens_ref[:] > (t_max - 1 - step)
    h, c, y, g = _lstm_cell_update(xpb_ref[0], whb_ref, hb_scr[:],
                                   cb_scr[:], valid_b)
    hb_scr[:] = h
    cb_scr[:] = c
    yb_ref[0] = y
    cb_ref[0] = c
    gb_ref[0] = g


def _dgates_update(dy, gates, c, c_prev, wh_t_ref, dh, dc, valid):
    """One backward cell step; returns (dgates, dh_new, dc_new)."""
    hdim = dh.shape[-1]
    i = gates[:, 0 * hdim:1 * hdim]
    f = gates[:, 1 * hdim:2 * hdim]
    g = gates[:, 2 * hdim:3 * hdim]
    o = gates[:, 3 * hdim:4 * hdim]
    tanh_c = jnp.tanh(c)
    dh_total = dy + dh
    dc_total = dc + dh_total * o * (1.0 - tanh_c * tanh_c)
    do = dh_total * tanh_c * o * (1.0 - o)
    di = dc_total * g * i * (1.0 - i)
    df = dc_total * c_prev * f * (1.0 - f)
    dg = dc_total * i * (1.0 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)
    dgates = jnp.where(valid, dgates, 0.0)
    dh_new = jnp.dot(dgates.astype(wh_t_ref.dtype), wh_t_ref[:],
                     preferred_element_type=jnp.float32)
    return (dgates, jnp.where(valid, dh_new, dh),
            jnp.where(valid, dc_total * f, dc))


def _bibwd_kernel(lens_ref, dyf_ref, gf_ref, cf_ref, cpf_ref,
                  dyb_ref, gb_ref, cb_ref, cpb_ref, whf_t_ref, whb_t_ref,
                  dgf_ref, dgb_ref, dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                  *, t_max: int):
    """dgates for both directions: step s handles the forward direction
    at t=t_max-1-s (reverse of its forward order) and the backward
    direction at t=s."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dcf_scr[:] = jnp.zeros_like(dcf_scr)
        dhb_scr[:] = jnp.zeros_like(dhb_scr)
        dcb_scr[:] = jnp.zeros_like(dcb_scr)

    valid_f = lens_ref[:] > (t_max - 1 - step)
    dg, dh, dc = _dgates_update(dyf_ref[0], gf_ref[0], cf_ref[0],
                                cpf_ref[0], whf_t_ref, dhf_scr[:],
                                dcf_scr[:], valid_f)
    dhf_scr[:] = dh
    dcf_scr[:] = dc
    dgf_ref[0] = dg

    valid_b = lens_ref[:] > step
    dg, dh, dc = _dgates_update(dyb_ref[0], gb_ref[0], cb_ref[0],
                                cpb_ref[0], whb_t_ref, dhb_scr[:],
                                dcb_scr[:], valid_b)
    dhb_scr[:] = dh
    dcb_scr[:] = dc
    dgb_ref[0] = dg


def _time_spec(t_max: int, reverse: bool, block_shape):
    if reverse:
        index = lambda s: (t_max - 1 - s,) + (0,) * (len(block_shape) - 1)
    else:
        index = lambda s: (s,) + (0,) * (len(block_shape) - 1)
    return pl.BlockSpec((1,) + tuple(block_shape[1:]), index,
                        memory_space=pltpu.VMEM)


def lstm_seq_fwd(x_proj, w_h, lens, reverse=False, interpret=False):
    """Forward LSTM over a full sequence.

    Args:
      x_proj: [T, B, 4H] precomputed input projection (+bias).
      w_h: [H, 4H] recurrent weights.
      lens: [B] int32 valid lengths.
      reverse: process t = T-1..0 (backward BLSTM direction).
    Returns:
      (y [T,B,H], c_seq [T,B,H], gates_seq [T,B,4H]) — y is the output,
      the rest are residuals for the backward pass.
    """
    t_max, b, g4 = x_proj.shape
    h = g4 // 4
    kern = functools.partial(_fwd_kernel, t_max=t_max, reverse=reverse)
    grid = (t_max,)
    y, c_seq, gates_seq = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens [B,1] f32
            _time_spec(t_max, reverse, (1, b, g4)),           # x_proj
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h
        ],
        out_specs=[
            _time_spec(t_max, reverse, (1, b, h)),            # y
            _time_spec(t_max, reverse, (1, b, h)),            # c_seq
            _time_spec(t_max, reverse, (1, b, g4)),           # gates_seq
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], x_proj, w_h)
    return y, c_seq, gates_seq


def _lstm_seq_bwd_dgates(dy, gates_seq, c_seq, c_prev_seq, w_h, lens,
                         reverse=False, interpret=False):
    t_max, b, h = dy.shape
    g4 = 4 * h
    kern = functools.partial(_bwd_kernel, t_max=t_max, reverse=reverse)
    # the backward kernel walks the opposite order; its _time_spec flips
    rev_order = not reverse
    dgates = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens [B,1] f32
            _time_spec(t_max, rev_order, (1, b, h)),          # dy
            _time_spec(t_max, rev_order, (1, b, g4)),         # gates
            _time_spec(t_max, rev_order, (1, b, h)),          # c
            _time_spec(t_max, rev_order, (1, b, h)),          # c_prev
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h^T
        ],
        out_specs=[_time_spec(t_max, rev_order, (1, b, g4))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g4), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], dy, gates_seq, c_seq, c_prev_seq,
      w_h.T)
    return dgates[0] if isinstance(dgates, (list, tuple)) else dgates


def _shift_prev(seq, reverse):
    """Previous-state sequence: zeros at the first processed step."""
    t_max = seq.shape[0]
    if reverse:
        return jnp.concatenate([seq[1:], jnp.zeros_like(seq[:1])], axis=0)
    return jnp.concatenate([jnp.zeros_like(seq[:1]), seq[:-1]], axis=0)


def _bilstm_seq_fwd(xp_f, xp_b, w_h_f, w_h_b, lens, interpret=False):
    t_max, b, g4 = xp_f.shape
    h = g4 // 4
    kern = functools.partial(_bifwd_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, False)
    bw = functools.partial(_time_spec, t_max, True)
    outs = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens
            fw((1, b, g4)),                                   # xp_f
            bw((1, b, g4)),                                   # xp_b
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h_f
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h_b
        ],
        out_specs=[fw((1, b, h)), fw((1, b, h)), fw((1, b, g4)),
                   bw((1, b, h)), bw((1, b, h)), bw((1, b, g4))],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g4), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, g4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], xp_f, xp_b, w_h_f, w_h_b)
    return outs  # y_f, c_f, g_f, y_b, c_b, g_b


def _bilstm_seq_bwd_dgates(dy_f, dy_b, g_f, c_f, cp_f, g_b, c_b, cp_b,
                           w_h_f, w_h_b, lens, interpret=False):
    t_max, b, h = dy_f.shape
    g4 = 4 * h
    kern = functools.partial(_bibwd_kernel, t_max=t_max)
    # the forward direction's dgates walk reversed time; the backward
    # direction's walk forward time
    fw = functools.partial(_time_spec, t_max, True)
    bw = functools.partial(_time_spec, t_max, False)
    dg_f, dg_b = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens
            fw((1, b, h)), fw((1, b, g4)), fw((1, b, h)), fw((1, b, h)),
            bw((1, b, h)), bw((1, b, g4)), bw((1, b, h)), bw((1, b, h)),
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_f^T
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_b^T
        ],
        out_specs=[fw((1, b, g4)), bw((1, b, g4))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g4), jnp.float32),
                   jax.ShapeDtypeStruct((t_max, b, g4), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None],
      dy_f, g_f, c_f, cp_f, dy_b, g_b, c_b, cp_b, w_h_f.T, w_h_b.T)
    return dg_f, dg_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bilstm_sequence(xp_f, xp_b, w_h_f, w_h_b, lens, interpret=False):
    """Fused bidirectional LSTM layer → (y_f, y_b), each [T, B, H].

    Equivalent to lstm_sequence(xp_f, w_h_f, lens, reverse=False) and
    lstm_sequence(xp_b, w_h_b, lens, reverse=True), but both directions
    advance inside one sequential grid (halves the recursion passes)."""
    y_f, _, _, y_b, _, _ = _bilstm_seq_fwd(xp_f, xp_b, w_h_f, w_h_b, lens,
                                           interpret)
    return y_f, y_b


def _bilstm_fwd(xp_f, xp_b, w_h_f, w_h_b, lens, interpret):
    y_f, c_f, g_f, y_b, c_b, g_b = _bilstm_seq_fwd(
        xp_f, xp_b, w_h_f, w_h_b, lens, interpret)
    return (y_f, y_b), (w_h_f, w_h_b, lens, y_f, c_f, g_f, y_b, c_b, g_b)


def _bilstm_bwd(interpret, res, cot):
    dy_f, dy_b = cot
    w_h_f, w_h_b, lens, y_f, c_f, g_f, y_b, c_b, g_b = res
    cp_f = _shift_prev(c_f, False)
    cp_b = _shift_prev(c_b, True)
    dg_f, dg_b = _bilstm_seq_bwd_dgates(
        dy_f, dy_b, g_f, c_f, cp_f, g_b, c_b, cp_b, w_h_f, w_h_b, lens,
        interpret)
    t_max, b, h = y_f.shape
    hp_f = _shift_prev(y_f, False)
    hp_b = _shift_prev(y_b, True)
    dw_f = jnp.dot(hp_f.reshape(t_max * b, h).astype(w_h_f.dtype).T,
                   dg_f.reshape(t_max * b, 4 * h).astype(w_h_f.dtype),
                   preferred_element_type=jnp.float32).astype(w_h_f.dtype)
    dw_b = jnp.dot(hp_b.reshape(t_max * b, h).astype(w_h_b.dtype).T,
                   dg_b.reshape(t_max * b, 4 * h).astype(w_h_b.dtype),
                   preferred_element_type=jnp.float32).astype(w_h_b.dtype)
    return dg_f, dg_b, dw_f, dw_b, None


bilstm_sequence.defvjp(_bilstm_fwd, _bilstm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_sequence(x_proj, w_h, lens, reverse=False, interpret=False):
    """Differentiable fused LSTM over a sequence → y [T, B, H]."""
    y, _, _ = lstm_seq_fwd(x_proj, w_h, lens, reverse, interpret)
    return y


def _lstm_sequence_fwd(x_proj, w_h, lens, reverse, interpret):
    y, c_seq, gates_seq = lstm_seq_fwd(x_proj, w_h, lens, reverse, interpret)
    return y, (x_proj, w_h, lens, y, c_seq, gates_seq)


def _lstm_sequence_bwd(reverse, interpret, res, dy):
    x_proj, w_h, lens, y, c_seq, gates_seq = res
    c_prev_seq = _shift_prev(c_seq, reverse)
    dgates = _lstm_seq_bwd_dgates(dy, gates_seq, c_seq, c_prev_seq, w_h,
                                  lens, reverse, interpret)
    h_prev = _shift_prev(y, reverse)
    t_max, b, h = y.shape
    # weight gradient: one large MXU matmul over all timesteps
    # (operands in the forward compute dtype, f32 accumulation, cotangent
    # cast back to w_h's dtype for the custom_vjp contract)
    dw_h = jnp.dot(
        h_prev.reshape(t_max * b, h).astype(w_h.dtype).T,
        dgates.reshape(t_max * b, 4 * h).astype(w_h.dtype),
        preferred_element_type=jnp.float32).astype(w_h.dtype)
    return dgates, dw_h, None


lstm_sequence.defvjp(_lstm_sequence_fwd, _lstm_sequence_bwd)
