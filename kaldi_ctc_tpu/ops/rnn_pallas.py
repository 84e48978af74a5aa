"""Pallas fused LSTM sequence kernels.

The TPU-native replacement for the cuDNN RNN kernel surface
(``cudamatrix/cudnn-recurrent.h:17-140``).  The input projection
``x @ W_x + b`` is hoisted into one large XLA matmul (MXU-saturating);
these kernels implement the *sequential* part — the per-timestep recurrent
matmul + gate fusion — with the hidden/cell state resident in VMEM scratch
that persists across the (sequential) TPU grid steps, so the recurrence
never round-trips HBM.

Measured on v5e, these kernels are **HBM-bandwidth-bound, not
compute-bound**: a pure copy kernel over the same blocks costs ~80% of
the full LSTM step (the recurrent matmul, the gate transcendentals and
even the sequential scratch dependency are hidden under the block DMA).
The design therefore minimizes HBM bytes:

- forward: grid=(T,), per step ``gates = x_proj[t] + h @ W_h`` on the MXU
  followed by fused VPU gate math; only ``y`` and the cell states are
  written out as residuals — the activated gates (4H wide, the largest
  residual) are NOT stored;
- backward: same structure in reverse.  The gates are *recomputed* from
  ``x_proj[t] + y[t-1] @ W_h`` (bit-identical to the forward: the same
  f32 ops on the same inputs, and y[t-1] equals the h carry at every
  valid step), trading a free MXU matmul for 4H·T·B of HBM traffic.
  The shifted neighbours y[t-1] / c[t-1] enter as *block-spec views of
  the same arrays* (clamped index maps + a boundary zero in-kernel), so
  no shifted copies are materialized.  The weight gradients
  ``dW_h = h_prevᵀ·dgates`` / ``dW_x = xᵀ·dgates`` are again large XLA
  matmuls outside the kernel.

Direction is handled by index arithmetic (reverse=True flips the time
index map), so backward-direction BLSTM layers reuse the same kernels.
Length masking matches ops.rnn: state carries across pad frames, outputs
there are zero.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_sequence", "lstm_seq_fwd", "bilstm_layer"]


def _bf16_f32_sites():
    """Sites kept in f32 under bfloat16 compute (KCTPU_BF16F32, comma
    list): 'xproj' stores the input projection f32, 'y' stores layer
    outputs f32, 'dgates' stores backward gate grads f32, 'dwop' uses
    f32 operands for the weight-gradient matmuls.  The bf16 quality
    ablation knob (recipes/hard) — the shipped bf16 default is the
    winning configuration; the env override remains for re-running the
    per-site localization."""
    return set(filter(None,
                      os.environ.get("KCTPU_BF16F32", "").split(",")))


def _lstm_gates(xp, h, wh_ref):
    """Activated gates (i, f, g, o) from the stored projection and the
    previous output.  THE single definition of the gate computation:
    both the forward cell and the backward recomputation call this, so
    the recompute-instead-of-store design's bit-identity invariant holds
    by construction.  xp may be stored in bfloat16 (mixed-precision
    mode); gate math is always f32, and h enters only as the
    cast-to-w_h-dtype matmul operand — so in backward, bf16-stored
    y[t-1] yields exactly the forward's operand."""
    gates = xp.astype(jnp.float32) + jnp.dot(
        h.astype(wh_ref.dtype), wh_ref[:],
        preferred_element_type=jnp.float32)
    hdim = wh_ref.shape[0]
    i = jax.nn.sigmoid(gates[:, 0 * hdim:1 * hdim])
    f = jax.nn.sigmoid(gates[:, 1 * hdim:2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim:4 * hdim])
    return i, f, g, o


def _lstm_cell_update(xp, wh_ref, h, c, valid):
    """One LSTM cell step; returns (h_out, c_out, y)."""
    i, f, g, o = _lstm_gates(xp, h, wh_ref)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_out = jnp.where(valid, h_new, h)
    c_out = jnp.where(valid, c_new, c)
    return h_out, c_out, jnp.where(valid, h_new, 0.0)


def _fwd_kernel(lens_ref, xp_ref, wh_ref, y_ref, c_ref,
                h_scr, c_scr, *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    t = (t_max - 1 - step) if reverse else step

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    valid = lens_ref[:] > t  # [B, 1] float lengths in VMEM
    h, c, y = _lstm_cell_update(xp_ref[0], wh_ref, h_scr[:], c_scr[:], valid)
    h_scr[:] = h
    c_scr[:] = c
    y_ref[0] = y.astype(y_ref.dtype)
    c_ref[0] = c





def _dgates_update(dy, ifgo, c, c_prev, wh_t_ref, dh, dc, valid):
    """One backward cell step; returns (dgates, dh_new, dc_new)."""
    i, f, g, o = ifgo
    tanh_c = jnp.tanh(c)
    dh_total = dy.astype(jnp.float32) + dh
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


def _zero_at(first, x):
    """x, except all-zeros when the scalar condition `first` holds."""
    return jnp.where(first, jnp.zeros_like(x), x)


def _bwd_kernel(lens_ref, dy_ref, xp_ref, hp_ref, clast_ref, cp_ref,
                wh_ref, wh_t_ref, dgates_ref, dh_scr, dc_scr, c_scr,
                *, t_max: int, reverse: bool):
    step = pl.program_id(0)
    # walk time in the opposite order of the forward pass
    t = step if reverse else (t_max - 1 - step)

    @pl.when(step == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        # c[t] at the walk's first step = the forward pass's last cell
        # state; every later step's c[t] is the previous step's cp read
        c_scr[:] = clast_ref[0]

    # the forward pass's first processed step (t=0 fwd / t=T-1 reverse) is
    # reached at the bwd walk's last step; its h/c "previous" is zero
    first = step == t_max - 1
    hp = _zero_at(first, hp_ref[0])
    cp_raw = cp_ref[0]
    cp = _zero_at(first, cp_raw)
    ifgo = _lstm_gates(xp_ref[0], hp, wh_ref)
    valid = lens_ref[:] > t
    dgates, dh, dc = _dgates_update(dy_ref[0], ifgo, c_scr[:], cp,
                                    wh_t_ref, dh_scr[:], dc_scr[:], valid)
    dh_scr[:] = dh
    dc_scr[:] = dc
    c_scr[:] = cp_raw
    dgates_ref[0] = dgates.astype(dgates_ref.dtype)


def _proj(x_blk, wx_ref, b_ref):
    """In-kernel input projection: f32-accumulated MXU matmul + bias,
    quantized to the compute dtype — the same ops, in the same order, as
    the hoisted-XLA projection path, and THE single definition both the
    forward cell and the backward gate recomputation call (so the
    recompute invariant holds for the projection too)."""
    p = jnp.dot(x_blk.astype(wx_ref.dtype), wx_ref[:],
                preferred_element_type=jnp.float32) + b_ref[0]
    return p.astype(wx_ref.dtype)


def _bifwd_proj_kernel(lens_ref, xf_ref, xb_ref, wxf_ref, wxb_ref,
                       bf_ref, bb_ref, whf_ref, whb_ref,
                       yf_ref, cf_ref, yb_ref, cb_ref,
                       hf_scr, cf_scr, hb_scr, cb_scr, *, t_max: int):
    """_bifwd_kernel with the input projection fused in: x enters the
    kernel once per direction ([1,B,D] blocks) instead of the 4x-wider
    precomputed projection being written to and re-read from HBM — the
    dominant stream of the hoisted design (VERDICT round-1 weak #4's
    identified lever).  Weights live in VMEM across the grid."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)
        cb_scr[:] = jnp.zeros_like(cb_scr)

    valid_f = lens_ref[:] > step
    xp = _proj(xf_ref[0], wxf_ref, bf_ref)
    h, c, y = _lstm_cell_update(xp, whf_ref, hf_scr[:], cf_scr[:], valid_f)
    hf_scr[:] = h
    cf_scr[:] = c
    yf_ref[0] = y.astype(yf_ref.dtype)
    cf_ref[0] = c

    valid_b = lens_ref[:] > (t_max - 1 - step)
    xp = _proj(xb_ref[0], wxb_ref, bb_ref)
    h, c, y = _lstm_cell_update(xp, whb_ref, hb_scr[:], cb_scr[:], valid_b)
    hb_scr[:] = h
    cb_scr[:] = c
    yb_ref[0] = y.astype(yb_ref.dtype)
    cb_ref[0] = c


def _bibwd_proj_kernel(lens_ref, dyf_ref, xf_ref, hpf_ref, cflast_ref,
                       cpf_ref, dyb_ref, xb_ref, hpb_ref, cblast_ref,
                       cpb_ref, wxf_ref, wxb_ref, bf_ref, bb_ref,
                       whf_ref, whf_t_ref, whb_ref, whb_t_ref,
                       dgf_ref, dgb_ref, dhf_scr, dcf_scr, dhb_scr,
                       dcb_scr, ccf_scr, ccb_scr, *, t_max: int):
    """_bibwd_kernel with the gate recomputation fed by the in-kernel
    projection from x (same _proj as forward → bit-identical gates)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dcf_scr[:] = jnp.zeros_like(dcf_scr)
        dhb_scr[:] = jnp.zeros_like(dhb_scr)
        dcb_scr[:] = jnp.zeros_like(dcb_scr)
        ccf_scr[:] = cflast_ref[0]
        ccb_scr[:] = cblast_ref[0]

    first = step == t_max - 1

    valid_f = lens_ref[:] > (t_max - 1 - step)
    hp = _zero_at(first, hpf_ref[0])
    cp_raw = cpf_ref[0]
    cp = _zero_at(first, cp_raw)
    ifgo = _lstm_gates(_proj(xf_ref[0], wxf_ref, bf_ref), hp, whf_ref)
    dg, dh, dc = _dgates_update(dyf_ref[0], ifgo, ccf_scr[:], cp,
                                whf_t_ref, dhf_scr[:], dcf_scr[:], valid_f)
    dhf_scr[:] = dh
    dcf_scr[:] = dc
    ccf_scr[:] = cp_raw
    dgf_ref[0] = dg.astype(dgf_ref.dtype)

    valid_b = lens_ref[:] > step
    hp = _zero_at(first, hpb_ref[0])
    cp_raw = cpb_ref[0]
    cp = _zero_at(first, cp_raw)
    ifgo = _lstm_gates(_proj(xb_ref[0], wxb_ref, bb_ref), hp, whb_ref)
    dg, dh, dc = _dgates_update(dyb_ref[0], ifgo, ccb_scr[:], cp,
                                whb_t_ref, dhb_scr[:], dcb_scr[:], valid_b)
    dhb_scr[:] = dh
    dcb_scr[:] = dc
    ccb_scr[:] = cp_raw
    dgb_ref[0] = dg.astype(dgb_ref.dtype)


def _bifwd_kernel(lens_ref, xpf_ref, xpb_ref, whf_ref, whb_ref,
                  yf_ref, cf_ref, yb_ref, cb_ref,
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
    h, c, y = _lstm_cell_update(xpf_ref[0], whf_ref, hf_scr[:],
                                cf_scr[:], valid_f)
    hf_scr[:] = h
    cf_scr[:] = c
    yf_ref[0] = y.astype(yf_ref.dtype)
    cf_ref[0] = c

    valid_b = lens_ref[:] > (t_max - 1 - step)
    h, c, y = _lstm_cell_update(xpb_ref[0], whb_ref, hb_scr[:],
                                cb_scr[:], valid_b)
    hb_scr[:] = h
    cb_scr[:] = c
    yb_ref[0] = y.astype(yb_ref.dtype)
    cb_ref[0] = c


def _bibwd_kernel(lens_ref, dyf_ref, xpf_ref, hpf_ref, cflast_ref, cpf_ref,
                  dyb_ref, xpb_ref, hpb_ref, cblast_ref, cpb_ref,
                  whf_ref, whf_t_ref, whb_ref, whb_t_ref,
                  dgf_ref, dgb_ref, dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                  ccf_scr, ccb_scr, *, t_max: int):
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
        # c[t] at each walk's first step is that direction's last
        # forward cell state; later steps carry the previous cp read
        ccf_scr[:] = cflast_ref[0]
        ccb_scr[:] = cblast_ref[0]

    # both directions hit their forward-first step at s == t_max-1
    # (fwd dir: t=0; bwd dir: t=t_max-1)
    first = step == t_max - 1

    valid_f = lens_ref[:] > (t_max - 1 - step)
    hp = _zero_at(first, hpf_ref[0])
    cp_raw = cpf_ref[0]
    cp = _zero_at(first, cp_raw)
    ifgo = _lstm_gates(xpf_ref[0], hp, whf_ref)
    dg, dh, dc = _dgates_update(dyf_ref[0], ifgo, ccf_scr[:], cp,
                                whf_t_ref, dhf_scr[:], dcf_scr[:], valid_f)
    dhf_scr[:] = dh
    dcf_scr[:] = dc
    ccf_scr[:] = cp_raw
    dgf_ref[0] = dg.astype(dgf_ref.dtype)

    valid_b = lens_ref[:] > step
    hp = _zero_at(first, hpb_ref[0])
    cp_raw = cpb_ref[0]
    cp = _zero_at(first, cp_raw)
    ifgo = _lstm_gates(xpb_ref[0], hp, whb_ref)
    dg, dh, dc = _dgates_update(dyb_ref[0], ifgo, ccb_scr[:], cp,
                                whb_t_ref, dhb_scr[:], dcb_scr[:], valid_b)
    dhb_scr[:] = dh
    dcb_scr[:] = dc
    ccb_scr[:] = cp_raw
    dgb_ref[0] = dg.astype(dgb_ref.dtype)


def _fwd_kernel_tb(lens_ref, xp_ref, wh_ref, y_ref, c_ref,
                   h_scr, c_scr, *, nblk: int, bt: int, reverse: bool):
    """Time-blocked forward cell: bt sequential steps per grid step.

    The per-step kernels stream one [1, B, 4H] block (~250 KB at
    flagship shapes) per grid step; measured on v5e, even a pure copy
    at that granularity reaches only ~16% of HBM peak — the grid-step
    DMA latency, not bandwidth, is the ceiling (BENCH roofline,
    round 4).  Blocking bt steps per grid step moves bt× the data per
    DMA while the recurrence stays sequential inside the kernel on
    VMEM-resident data."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    blk = (nblk - 1 - step) if reverse else step

    def body(j, carry):
        h, c = carry
        i = (bt - 1 - j) if reverse else j   # in-block visit order
        t = blk * bt + i                     # global (forward) time
        valid = lens_ref[:] > t
        h, c, y = _lstm_cell_update(xp_ref[i], wh_ref, h, c, valid)
        y_ref[i] = y.astype(y_ref.dtype)
        c_ref[i] = c
        return h, c

    h, c = jax.lax.fori_loop(0, bt, body, (h_scr[:], c_scr[:]))
    h_scr[:] = h
    c_scr[:] = c


def _time_block_spec(nblk: int, reverse: bool, bt: int, block_shape):
    """BlockSpec over bt-step time blocks (block s ↦ time block
    [blk*bt, (blk+1)*bt), walking from the end when reverse)."""
    if reverse:
        index = lambda s: (nblk - 1 - s,) + (0,) * (len(block_shape) - 1)
    else:
        index = lambda s: (s,) + (0,) * (len(block_shape) - 1)
    return pl.BlockSpec((bt,) + tuple(block_shape[1:]), index,
                        memory_space=pltpu.VMEM)


def _time_spec(t_max: int, reverse: bool, block_shape):
    if reverse:
        index = lambda s: (t_max - 1 - s,) + (0,) * (len(block_shape) - 1)
    else:
        index = lambda s: (s,) + (0,) * (len(block_shape) - 1)
    return pl.BlockSpec((1,) + tuple(block_shape[1:]), index,
                        memory_space=pltpu.VMEM)


def _const_spec(t_index: int, block_shape):
    """Constant view of one time block (fetched once, stays in VMEM)."""
    index = lambda s: (t_index,) + (0,) * (len(block_shape) - 1)
    return pl.BlockSpec((1,) + tuple(block_shape[1:]), index,
                        memory_space=pltpu.VMEM)


def _prev_spec(t_max: int, walk_reverse: bool, fwd_reverse: bool,
               block_shape):
    """View of the previous-in-forward-order block for a backward walk.

    walk_reverse: whether the *walk* visits t = T-1-s (True) or t = s.
    fwd_reverse: whether the forward pass ran reversed (its "previous"
    neighbour is t+1 rather than t-1).  Index clamped at the boundary;
    the kernel zeroes the value at the forward-first step.
    """
    if walk_reverse:
        t_of = lambda s: t_max - 1 - s
    else:
        t_of = lambda s: s
    if fwd_reverse:
        index = lambda s: (jnp.minimum(t_of(s) + 1, t_max - 1),) + \
            (0,) * (len(block_shape) - 1)
    else:
        index = lambda s: (jnp.maximum(t_of(s) - 1, 0),) + \
            (0,) * (len(block_shape) - 1)
    return pl.BlockSpec((1,) + tuple(block_shape[1:]), index,
                        memory_space=pltpu.VMEM)


def _pick_block_t(t_max: int, b: int, h: int, dtype_bytes: int,
                  block_t=None) -> int:
    """Largest supported time block: divides t_max, caps VMEM use.

    Streams per block: xp [bt,B,4H] + y [bt,B,H] in the compute dtype,
    plus c_seq [bt,B,H] which is ALWAYS f32 (the cell-state residual is
    kept full precision even under bf16 compute) — so the per-step byte
    count is B·H·(5·itemsize + 4).  Keep the time-block working set
    under ~4 MB so xp/y/c blocks plus weights and scratch fit VMEM
    (16 MB) with double buffering."""
    if block_t is not None:
        if t_max % block_t == 0:
            return block_t
        import warnings
        warnings.warn(
            f"block_t={block_t} does not divide t_max={t_max}; "
            f"falling back to block_t=1", stacklevel=3)
        return 1
    budget = 4 * 1024 * 1024
    per_step = b * h * (5 * dtype_bytes + 4)
    best = 1
    for bt in (32, 16, 8, 4, 2):
        if t_max % bt == 0 and per_step * bt <= budget:
            best = bt
            break
    return best


def lstm_seq_fwd(x_proj, w_h, lens, reverse=False, interpret=False,
                 block_t=None):
    """Forward LSTM over a full sequence.

    Args:
      x_proj: [T, B, 4H] precomputed input projection (+bias).
      w_h: [H, 4H] recurrent weights.
      lens: [B] int32 valid lengths.
      reverse: process t = T-1..0 (backward BLSTM direction).
      block_t: time steps per grid step (None = auto; see
        _pick_block_t and the roofline note on _fwd_kernel_tb).
    Returns:
      (y [T,B,H], c_seq [T,B,H]) — y is the output, c_seq the cell-state
      residual for the backward pass (gates are recomputed there).
    """
    t_max, b, g4 = x_proj.shape
    h = g4 // 4
    bt = _pick_block_t(t_max, b, h, x_proj.dtype.itemsize, block_t)
    if bt > 1:
        nblk = t_max // bt
        kern = functools.partial(_fwd_kernel_tb, nblk=nblk, bt=bt,
                                 reverse=reverse)
        y, c_seq = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((b, 1), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),        # lens
                _time_block_spec(nblk, reverse, bt, (1, b, g4)),  # x_proj
                pl.BlockSpec((h, g4), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),        # w_h
            ],
            out_specs=[
                _time_block_spec(nblk, reverse, bt, (1, b, h)),   # y
                _time_block_spec(nblk, reverse, bt, (1, b, h)),   # c_seq
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t_max, b, h), x_proj.dtype),
                jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, h), jnp.float32),
                pltpu.VMEM((b, h), jnp.float32),
            ],
            interpret=interpret,
        )(lens.astype(jnp.float32)[:, None], x_proj, w_h)
        return y, c_seq
    kern = functools.partial(_fwd_kernel, t_max=t_max, reverse=reverse)
    grid = (t_max,)
    y, c_seq = pl.pallas_call(
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), x_proj.dtype),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], x_proj, w_h)
    return y, c_seq


def _lstm_seq_bwd_dgates(dy, x_proj, y, c_seq, w_h, lens,
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
            _time_spec(t_max, rev_order, (1, b, g4)),         # x_proj
            _prev_spec(t_max, rev_order, reverse, (1, b, h)),  # y[t∓1]
            _const_spec(0 if reverse else t_max - 1,
                        (1, b, h)),                           # c[last]
            _prev_spec(t_max, rev_order, reverse, (1, b, h)),  # c[t∓1]
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h^T
        ],
        out_specs=[_time_spec(t_max, rev_order, (1, b, g4))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g4), x_proj.dtype)],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], dy, x_proj, y, c_seq, c_seq,
      w_h, w_h.T)
    return dgates[0] if isinstance(dgates, (list, tuple)) else dgates


def _dw_h(y, dgates, reverse, op_dtype, out_dtype=jnp.float32):
    """dW_h = Σ_t h_prev[t]ᵀ · dgates[t] as one sliced MXU matmul.

    The first processed step has h_prev = 0 and contributes nothing, so
    the sum is y[:-1]ᵀ @ dg[1:] (forward) / y[1:]ᵀ @ dg[:-1] (reverse) —
    slices, not a materialized zero-padded shift copy.  Operands run in
    `op_dtype` (bf16 keeps the MXU rate in mixed precision); the f32
    accumulation is emitted at `out_dtype` — f32 by default, so weight
    gradients against f32 master params lose nothing."""
    t_max, b, h = y.shape
    g4 = dgates.shape[-1]
    if t_max == 1:
        return jnp.zeros((h, g4), out_dtype)
    if reverse:
        hp, dg = y[1:], dgates[:-1]
    else:
        hp, dg = y[:-1], dgates[1:]
    n = (t_max - 1) * b
    return jnp.dot(hp.reshape(n, h).astype(op_dtype).T,
                   dg.reshape(n, g4).astype(op_dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)


def _split_spec(t_max: int, reverse: bool, half: int, block_shape):
    """View of one direction's half of the fused [T, B, 2*4H] projection:
    block (1, b, 4H) at column-block `half` (0 = forward, 1 = backward)."""
    if reverse:
        index = lambda s: (t_max - 1 - s, 0, half)
    else:
        index = lambda s: (s, 0, half)
    return pl.BlockSpec((1,) + tuple(block_shape[1:]), index,
                        memory_space=pltpu.VMEM)


def _bilstm_seq_fwd(xp, w_h_f, w_h_b, lens, interpret=False,
                    y_dtype=None):
    """xp: fused [T, B, 2*4H] projection (fwd-direction half first)."""
    t_max, b, g8 = xp.shape
    y_dtype = xp.dtype if y_dtype is None else y_dtype
    g4 = g8 // 2
    h = g4 // 4
    kern = functools.partial(_bifwd_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, False)
    bw = functools.partial(_time_spec, t_max, True)
    # zero-copy half views need the half to be a whole number of 128-wide
    # lanes (Pallas block constraint); tiny models fall back to a split
    if g4 % 128 == 0:
        xp_f = xp_b = xp
        spec_f = _split_spec(t_max, False, 0, (1, b, g4))
        spec_b = _split_spec(t_max, True, 1, (1, b, g4))
    else:
        xp_f, xp_b = xp[..., :g4], xp[..., g4:]
        spec_f, spec_b = fw((1, b, g4)), bw((1, b, g4))
    outs = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens
            spec_f,                                           # xp fwd half
            spec_b,                                           # xp bwd half
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h_f
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h_b
        ],
        out_specs=[fw((1, b, h)), fw((1, b, h)),
                   bw((1, b, h)), bw((1, b, h))],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), y_dtype),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), y_dtype),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], xp_f, xp_b, w_h_f, w_h_b)
    return outs  # y_f, c_f, y_b, c_b


def _half_spec(rows: int, cols: int, half: int):
    """Constant VMEM view of one column half of a [rows, 2*cols] array."""
    return pl.BlockSpec((rows, cols), lambda s, _h=half: (0, _h),
                        memory_space=pltpu.VMEM)


def _bilstm_seq_fwd_proj(x, w_x, bias, w_h_f, w_h_b, lens,
                         interpret=False, y_dtype=None):
    """Forward with the input projection computed inside the kernel:
    x ([T,B,D]) streams in once per direction instead of the [T,B,2*4H]
    hoisted projection being written + re-read.  Requires lane-aligned
    D and 4H (both % 128 == 0) for the zero-copy half views."""
    t_max, b, d = x.shape
    g8 = w_x.shape[1]
    g4 = g8 // 2
    h = g4 // 4
    y_dtype = w_x.dtype if y_dtype is None else y_dtype
    kern = functools.partial(_bifwd_proj_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, False)
    bw = functools.partial(_time_spec, t_max, True)
    bias2 = bias.reshape(1, g8).astype(jnp.float32)
    outs = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens
            fw((1, b, d)), bw((1, b, d)),                     # x views
            _half_spec(d, g4, 0), _half_spec(d, g4, 1),       # w_x halves
            _half_spec(1, g4, 0), _half_spec(1, g4, 1),       # bias halves
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h_f
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_h_b
        ],
        out_specs=[fw((1, b, h)), fw((1, b, h)),
                   bw((1, b, h)), bw((1, b, h))],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, b, h), y_dtype),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t_max, b, h), y_dtype),
            jax.ShapeDtypeStruct((t_max, b, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 4,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], x, x, w_x, w_x, bias2, bias2,
      w_h_f, w_h_b)
    return outs  # y_f, c_f, y_b, c_b


def _bilstm_seq_bwd_dgates_proj(dy_f, dy_b, x, y_f, c_f, y_b, c_b,
                                w_x, bias, w_h_f, w_h_b, lens,
                                interpret=False, dg_dtype=None):
    t_max, b, h = dy_f.shape
    g4 = 4 * h
    dg_dtype = w_x.dtype if dg_dtype is None else dg_dtype
    d = x.shape[-1]
    kern = functools.partial(_bibwd_proj_kernel, t_max=t_max)
    fw = functools.partial(_time_spec, t_max, True)
    bw = functools.partial(_time_spec, t_max, False)
    fwp = functools.partial(_prev_spec, t_max, True, False)
    bwp = functools.partial(_prev_spec, t_max, False, True)
    bias2 = bias.reshape(1, 2 * g4).astype(jnp.float32)
    dg_f, dg_b = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens
            fw((1, b, h)), fw((1, b, d)),
            fwp((1, b, h)), _const_spec(t_max - 1, (1, b, h)),
            fwp((1, b, h)),
            bw((1, b, h)), bw((1, b, d)),
            bwp((1, b, h)), _const_spec(0, (1, b, h)),
            bwp((1, b, h)),
            _half_spec(d, g4, 0), _half_spec(d, g4, 1),       # w_x halves
            _half_spec(1, g4, 0), _half_spec(1, g4, 1),       # bias halves
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[fw((1, b, g4)), bw((1, b, g4))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g4), dg_dtype),
                   jax.ShapeDtypeStruct((t_max, b, g4), dg_dtype)],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 6,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None],
      dy_f, x, y_f, c_f, c_f,
      dy_b, x, y_b, c_b, c_b,
      w_x, w_x, bias2, bias2,
      w_h_f, w_h_f.T, w_h_b, w_h_b.T)
    return dg_f, dg_b


def _bilstm_seq_bwd_dgates(dy_f, dy_b, xp, y_f, c_f, y_b, c_b,
                           w_h_f, w_h_b, lens, interpret=False,
                           dg_dtype=None):
    t_max, b, h = dy_f.shape
    g4 = 4 * h
    dg_dtype = xp.dtype if dg_dtype is None else dg_dtype
    kern = functools.partial(_bibwd_kernel, t_max=t_max)
    # the forward direction's dgates walk reversed time; the backward
    # direction's walk forward time
    fw = functools.partial(_time_spec, t_max, True)
    bw = functools.partial(_time_spec, t_max, False)
    fwp = functools.partial(_prev_spec, t_max, True, False)   # y_f[t-1]
    bwp = functools.partial(_prev_spec, t_max, False, True)   # y_b[t+1]
    if g4 % 128 == 0:
        xp_f = xp_b = xp
        spec_f = _split_spec(t_max, True, 0, (1, b, g4))
        spec_b = _split_spec(t_max, False, 1, (1, b, g4))
    else:
        xp_f, xp_b = xp[..., :g4], xp[..., g4:]
        spec_f, spec_b = fw((1, b, g4)), bw((1, b, g4))
    dg_f, dg_b = pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # lens
            fw((1, b, h)), spec_f,
            fwp((1, b, h)), _const_spec(t_max - 1, (1, b, h)),
            fwp((1, b, h)),
            bw((1, b, h)), spec_b,
            bwp((1, b, h)), _const_spec(0, (1, b, h)),
            bwp((1, b, h)),
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_f
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_f^T
            pl.BlockSpec((h, g4), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_b
            pl.BlockSpec((g4, h), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),            # w_b^T
        ],
        out_specs=[fw((1, b, g4)), bw((1, b, g4))],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, g4), dg_dtype),
                   jax.ShapeDtypeStruct((t_max, b, g4), dg_dtype)],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)] * 6,
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None],
      dy_f, xp_f, y_f, c_f, c_f,
      dy_b, xp_b, y_b, c_b, c_b,
      w_h_f, w_h_f.T, w_h_b, w_h_b.T)
    return dg_f, dg_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def bilstm_layer(x, w_x, bias, w_h_f, w_h_b, lens, interpret=False,
                 compute_dtype="float32"):
    """Full fused bidirectional LSTM layer → (y_f, y_b), each [T, B, H].

    The input projection for both directions is one MXU matmul
    ``x @ w_x + bias`` with ``w_x = [w_x_fwd | w_x_bwd]`` ([D, 2*4H]);
    the fused [T, B, 2*4H] result feeds the sequential kernel through
    *block-spec views* — no per-direction split copies are materialized
    (that split alone cost >10% of a training step when this was a
    separate-operands API).  The backward pass produces per-direction
    dgates and folds them into dx / dW_x with per-direction matmuls,
    so no [T, B, 2*4H] cotangent concat is materialized either.
    """
    y_f, _, y_b, _, _ = _bilstm_layer_fwd_impl(x, w_x, bias, w_h_f, w_h_b,
                                               lens, interpret,
                                               compute_dtype)
    return y_f, y_b


def _use_in_kernel_proj(d: int, g4: int,
                        dtype=jnp.float32) -> bool:
    """In-kernel projection needs lane-aligned zero-copy half views of
    w_x/bias and a lane-aligned x block.  The first BLSTM layer's raw
    feature dim (e.g. 40) falls back to the hoisted-projection path.

    KCTPU_RNN_PROJ=in_kernel|hoisted overrides the choice (the bench
    A/B toggle); the default also checks a VMEM budget — the backward
    proj kernel pins w_x (both halves), w_h_f/w_h_b and their
    transposes in VMEM, which overflows for large-d float32 configs.

    Measured A/B at the flagship shapes (TPU v5 lite, bench.py with
    KCTPU_RNN_PROJ forced, 2026-08-21): f32 33,299 hoisted vs 33,351
    in-kernel audio-s/s/chip (a wash, +0.2% in-kernel); bf16 42,121
    hoisted vs 38,765 in-kernel (-8%: in bf16 the hoisted projection
    residual is half-width, so the HBM bytes the fused path saves no
    longer pay for its extra weight residency and recompute).  auto
    therefore dispatches in-kernel only for float32."""
    import os
    mode = os.environ.get("KCTPU_RNN_PROJ", "auto")
    aligned = d % 128 == 0 and g4 % 128 == 0
    if mode == "hoisted":
        return False
    if mode == "in_kernel":
        return aligned
    if not aligned:
        return False
    if jnp.dtype(dtype) == jnp.bfloat16:
        return False
    # resident weights in the bwd kernel: w_x [d,2*g4] + 2x recurrent
    # [h,g4] + their transposes; leave ~8 MB of the ~16 MB VMEM for the
    # double-buffered time blocks and scratch
    h = g4 // 4
    itemsize = jnp.dtype(dtype).itemsize
    resident = (d * 2 * g4 + 4 * h * g4) * itemsize
    return resident <= 8 * 1024 * 1024


def _bf16_cfg(compute_dtype):
    """(compute dtype, xp storage dtype, y storage dtype, dgates storage
    dtype, weight-grad operand dtype) for a compute_dtype string,
    honoring the KCTPU_BF16F32 ablation sites under bf16."""
    if compute_dtype != "bfloat16":
        f = jnp.float32
        return f, f, f, f, f
    sites = _bf16_f32_sites()
    cdt = jnp.bfloat16
    return (cdt,
            jnp.float32 if "xproj" in sites else cdt,
            jnp.float32 if "y" in sites else cdt,
            jnp.float32 if "dgates" in sites else cdt,
            jnp.float32 if "dwop" in sites else cdt)


def _bilstm_layer_fwd_impl(x, w_x, bias, w_h_f, w_h_b, lens, interpret,
                           compute_dtype="float32"):
    t_max, b, d = x.shape
    g4 = w_x.shape[1] // 2
    cdt, xp_dt, y_dt, _, _ = _bf16_cfg(compute_dtype)
    # params arrive in master precision (f32); the cast to the compute
    # dtype lives INSIDE the custom vjp so weight cotangents stay f32
    wx_c = w_x.astype(cdt)
    whf_c = w_h_f.astype(cdt)
    whb_c = w_h_b.astype(cdt)
    if _use_in_kernel_proj(d, g4, cdt):
        # projection fused into the kernel: x streams once per direction
        # and no [T,B,2*4H] projection residual is written, read, or
        # saved between passes (the hoisted design's dominant stream)
        y_f, c_f, y_b, c_b = _bilstm_seq_fwd_proj(
            x, wx_c, bias, whf_c, whb_c, lens, interpret, y_dtype=y_dt)
        return y_f, c_f, y_b, c_b, None
    # f32-accumulated projection, stored in the compute dtype (bf16
    # halves every later read of this — the largest stream in the layer)
    xp = (jnp.dot(x.reshape(t_max * b, d).astype(cdt), wx_c,
                  preferred_element_type=jnp.float32)
          + bias).astype(xp_dt).reshape(t_max, b, -1)
    y_f, c_f, y_b, c_b = _bilstm_seq_fwd(xp, whf_c, whb_c, lens, interpret,
                                         y_dtype=y_dt)
    return y_f, c_f, y_b, c_b, xp


def _bilstm_layer_fwd(x, w_x, bias, w_h_f, w_h_b, lens, interpret,
                      compute_dtype):
    y_f, c_f, y_b, c_b, xp = _bilstm_layer_fwd_impl(
        x, w_x, bias, w_h_f, w_h_b, lens, interpret, compute_dtype)
    # xp is None on the in-kernel-projection path: the projection is
    # recomputed from x in backward, so it is not a residual at all
    return (y_f, y_b), (x, w_x, bias, w_h_f, w_h_b, lens, xp,
                        y_f, c_f, y_b, c_b)


def _bilstm_layer_bwd(interpret, compute_dtype, res, cot):
    dy_f, dy_b = cot
    x, w_x, bias, w_h_f, w_h_b, lens, xp, y_f, c_f, y_b, c_b = res
    cdt, _, _, dg_dt, wop = _bf16_cfg(compute_dtype)
    wx_c = w_x.astype(cdt)
    whf_c = w_h_f.astype(cdt)
    whb_c = w_h_b.astype(cdt)
    if xp is None:
        dg_f, dg_b = _bilstm_seq_bwd_dgates_proj(
            dy_f, dy_b, x, y_f, c_f, y_b, c_b, wx_c, bias,
            whf_c, whb_c, lens, interpret, dg_dtype=dg_dt)
    else:
        dg_f, dg_b = _bilstm_seq_bwd_dgates(
            dy_f, dy_b, xp, y_f, c_f, y_b, c_b, whf_c, whb_c, lens,
            interpret, dg_dtype=dg_dt)
    t_max, b, h = y_f.shape
    g4 = 4 * h
    d = x.shape[-1]
    x2 = x.reshape(t_max * b, d)
    dgf2 = dg_f.reshape(t_max * b, g4)
    dgb2 = dg_b.reshape(t_max * b, g4)
    # recurrent-weight grads: one large sliced MXU matmul per direction,
    # f32-accumulated and EMITTED f32 (master params are f32, so
    # quantizing weight grads to bf16 — the pre-round-5 behavior — threw
    # away mantissa for no bandwidth win on these small tensors)
    dw_f = _dw_h(y_f, dg_f, False, wop)
    dw_b = _dw_h(y_b, dg_b, True, wop)
    # input grads: per-direction matmuls against the w_x halves (use the
    # f32 master weights when the operand dtype is f32)
    wx_op = w_x if wop == jnp.float32 else wx_c
    dx = (jnp.dot(dgf2.astype(wop), wx_op[:, :g4].T,
                  preferred_element_type=jnp.float32)
          + jnp.dot(dgb2.astype(wop), wx_op[:, g4:].T,
                    preferred_element_type=jnp.float32))
    dx = dx.astype(x.dtype).reshape(t_max, b, d)
    dw_x = jnp.concatenate(
        [jnp.dot(x2.astype(wop).T, dgf2.astype(wop),
                 preferred_element_type=jnp.float32),
         jnp.dot(x2.astype(wop).T, dgb2.astype(wop),
                 preferred_element_type=jnp.float32)],
        axis=1)
    dbias = jnp.concatenate([dgf2.sum(axis=0, dtype=jnp.float32),
                             dgb2.sum(axis=0, dtype=jnp.float32)])
    return dx, dw_x, dbias, dw_f, dw_b, None


bilstm_layer.defvjp(_bilstm_layer_fwd, _bilstm_layer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_sequence(x_proj, w_h, lens, reverse=False, interpret=False):
    """Differentiable fused LSTM over a sequence → y [T, B, H].

    w_h may arrive in master precision (f32): the cast to x_proj's
    compute dtype happens INSIDE the vjp, so the weight cotangent keeps
    the primal's (master) dtype and bf16 mode no longer quantizes dW."""
    y, _ = lstm_seq_fwd(x_proj, w_h.astype(x_proj.dtype), lens, reverse,
                        interpret)
    return y


def _lstm_sequence_fwd(x_proj, w_h, lens, reverse, interpret):
    y, c_seq = lstm_seq_fwd(x_proj, w_h.astype(x_proj.dtype), lens,
                            reverse, interpret)
    return y, (x_proj, w_h, lens, y, c_seq)


def _lstm_sequence_bwd(reverse, interpret, res, dy):
    x_proj, w_h, lens, y, c_seq = res
    cdt = x_proj.dtype
    dgates = _lstm_seq_bwd_dgates(dy, x_proj, y, c_seq,
                                  w_h.astype(cdt), lens, reverse,
                                  interpret)
    # weight gradient: one large sliced MXU matmul over all timesteps
    # (operands in the forward compute dtype, f32 accumulation, emitted
    # at the primal w_h's dtype — f32 when master params are passed)
    dw_h = _dw_h(y, dgates, reverse, cdt, out_dtype=w_h.dtype)
    return dgates, dw_h, None


lstm_sequence.defvjp(_lstm_sequence_fwd, _lstm_sequence_bwd)


# ---------------------------------------------------------------------------
# Wavefront multi-layer unidirectional forward
# ---------------------------------------------------------------------------
#
# The roofline (ROOFLINE.md) shows the sequence kernels are serial-step-
# latency-bound: L layers of T steps cost ~L*T fixed step latencies.
# For a UNIDIRECTIONAL stack the layer dependency is a wavefront — layer
# l at time t needs only layer l-1 at time t — so all L layers can run
# in ONE grid of T + L - 1 steps, with layer l processing t = s - l at
# grid step s.  Serial steps drop ~L-fold and the L independent
# recurrent matmul chains issue back to back inside each step, hiding
# the MXU pipeline latency the per-layer kernels pay serially.
#
# For BIDIRECTIONAL stacks this lever is structurally unavailable:
# layer l+1 at ANY time t consumes y_b^l[t], which the backward
# direction only produces after sweeping T-1..t — so at t=0 the entire
# layer-l backward pass must have finished, a full barrier between
# layers.  (The same dependency argument is why cuDNN's cross-layer RNN
# pipelining only applies to unidirectional models; the merged
# bidirectional kernels above already capture the one parallelism a
# BLSTM layer does expose — the two directions.)  This kernel therefore
# targets the unidirectional stacks: streaming/serving forwards
# (cli/serve.py) and unidirectional decode.
#
# Weight residency: all L layers' w_h (and w_x for l>=1) live in VMEM
# across the grid — bf16 weights fit the flagship 5x320 stack in ~7 MB;
# callers gate on _stack_fits_vmem for f32.


def _stack_kernel(lens_ref, xp0_ref, *rest, t_max, n_layers, stateful):
    L = n_layers
    i = 0
    wh = rest[i:i + L]
    i += L
    wx = rest[i:i + L - 1]
    i += L - 1
    bb = rest[i:i + L - 1]
    i += L - 1
    if stateful:
        h0_ref, c0_ref = rest[i], rest[i + 1]
        i += 2
    y_ref, hfin_ref, cfin_ref = rest[i], rest[i + 1], rest[i + 2]
    i += 3
    h_scr = rest[i:i + L]
    i += L
    c_scr = rest[i:i + L]
    i += L
    y_scr = rest[i:i + L - 1]

    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        for l in range(L):
            if stateful:
                h_scr[l][:] = h0_ref[l].astype(jnp.float32)
                c_scr[l][:] = c0_ref[l].astype(jnp.float32)
            else:
                h_scr[l][:] = jnp.zeros_like(h_scr[l])
                c_scr[l][:] = jnp.zeros_like(c_scr[l])

    # top layer first: layer l+1 must read y_scr[l] (last step's value)
    # before layer l overwrites it this step
    for l in reversed(range(L)):
        t = s - l

        @pl.when((t >= 0) & (t < t_max))
        def _cell(l=l, t=t):
            if l == 0:
                xp = xp0_ref[0].astype(jnp.float32)
            else:
                # quantize the projection to the compute dtype exactly
                # like the per-layer path stores it, so wavefront
                # streaming bit-matches the offline per-layer forward
                # in bf16 mode too (y_scr scratch is likewise in the
                # compute dtype)
                xp = ((jnp.dot(y_scr[l - 1][:].astype(wx[l - 1].dtype),
                               wx[l - 1][:],
                               preferred_element_type=jnp.float32)
                       + bb[l - 1][0])
                      .astype(wx[l - 1].dtype).astype(jnp.float32))
            gates = xp + jnp.dot(h_scr[l][:].astype(wh[l].dtype),
                                 wh[l][:],
                                 preferred_element_type=jnp.float32)
            hdim = wh[l].shape[0]
            ii = jax.nn.sigmoid(gates[:, 0 * hdim:1 * hdim])
            ff = jax.nn.sigmoid(gates[:, 1 * hdim:2 * hdim])
            gg = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
            oo = jax.nn.sigmoid(gates[:, 3 * hdim:4 * hdim])
            c_new = ff * c_scr[l][:] + ii * gg
            h_new = oo * jnp.tanh(c_new)
            valid = lens_ref[:] > t
            h_out = jnp.where(valid, h_new, h_scr[l][:])
            c_out = jnp.where(valid, c_new, c_scr[l][:])
            h_scr[l][:] = h_out
            c_scr[l][:] = c_out
            yv = jnp.where(valid, h_new, 0.0)
            if l == L - 1:
                y_ref[0] = yv.astype(y_ref.dtype)
            else:
                y_scr[l][:] = yv.astype(y_scr[l].dtype)

    # early steps target the clamped t=0 output block before the top
    # layer reaches it; zero it so the s = L-1 real write is the last
    @pl.when(s < L - 1)
    def _zero_head():
        y_ref[0] = jnp.zeros((y_ref.shape[1], y_ref.shape[2]),
                             y_ref.dtype)

    @pl.when(s == t_max + L - 2)
    def _fin():
        for l in range(L):
            hfin_ref[l] = h_scr[l][:]
            cfin_ref[l] = c_scr[l][:]


def lstm_stack_fwd(xp0, wxs, whs, bs, lens, h0=None, c0=None,
                   interpret=False):
    """Wavefront forward through an L-layer unidirectional LSTM stack.

    Args:
      xp0: [T, B, 4H] layer-0 input projection (+bias), precomputed —
        one MXU-saturating matmul like the per-layer path's.
      wxs: list of L-1 inter-layer input weights [H, 4H] (layer l>=1
        consumes layer l-1's output; projected IN-kernel per step).
      whs: list of L recurrent weights [H, 4H].
      bs: list of L-1 biases [4H] for layers >= 1.
      lens: [B] int32 valid lengths.
      h0, c0: optional [L, B, H] initial carries (streaming chunks).
    Returns:
      (y [T, B, H] of the last layer, h_fin [L, B, H], c_fin [L, B, H]).

    Inference-only (no residuals are saved); the training path keeps the
    per-layer kernels, whose backward passes recompute gates from saved
    per-layer activations.
    """
    t_max, b, g4 = xp0.shape
    h = g4 // 4
    L = len(whs)
    assert len(wxs) == L - 1 and len(bs) == L - 1
    stateful = h0 is not None
    kern = functools.partial(_stack_kernel, t_max=t_max, n_layers=L,
                             stateful=stateful)
    steps = t_max + L - 1
    const = lambda shape: pl.BlockSpec(
        shape, lambda s: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [const((b, 1))]
    in_specs.append(pl.BlockSpec(
        (1, b, g4), lambda s: (jnp.minimum(s, t_max - 1), 0, 0),
        memory_space=pltpu.VMEM))
    in_specs += [const((h, g4))] * L          # whs
    in_specs += [const((h, g4))] * (L - 1)    # wxs
    in_specs += [const((1, g4))] * (L - 1)    # biases
    args = [lens.astype(jnp.float32)[:, None], xp0]
    args += list(whs) + list(wxs) + [bb.reshape(1, g4) for bb in bs]
    if stateful:
        in_specs += [const((L, b, h))] * 2
        args += [h0, c0]
    Lm1 = L - 1
    out_specs = [
        pl.BlockSpec((1, b, h),
                     lambda s: (jnp.clip(s - Lm1, 0, t_max - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        const((L, b, h)),
        const((L, b, h)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_max, b, h), xp0.dtype),
        jax.ShapeDtypeStruct((L, b, h), jnp.float32),
        jax.ShapeDtypeStruct((L, b, h), jnp.float32),
    ]
    scratch = ([pltpu.VMEM((b, h), jnp.float32)] * (2 * L)
               + [pltpu.VMEM((b, h), xp0.dtype)] * (L - 1))
    y, h_fin, c_fin = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return y, h_fin, c_fin


def stack_weights_fit_vmem(num_layers: int, hidden: int, itemsize: int,
                           budget: int = 10 * 1024 * 1024) -> bool:
    """Can all L layers' weights stay VMEM-resident for the wavefront
    kernel?  (2L-1) matrices of [H, 4H] plus working blocks."""
    return (2 * num_layers - 1) * hidden * 4 * hidden * itemsize <= budget
