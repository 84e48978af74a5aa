"""Pallas kernels for the CTC alpha/beta recursions.

The warp-ctc replacement's hot path: the per-frame lattice update
(3-way shifted logaddexp over the blank-interleaved states) fused into one
VPU kernel per frame with the state row resident in VMEM across the
sequential grid (no HBM round-trip of alpha between timesteps).  The
label gather, posterior scatter, and logZ math stay in XLA where they are
single fused ops (ops/ctc.py drives both implementations).

Layout: states S on the lane dimension, batch B on sublanes; the shifted
reads are lane rolls + iota masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["forward_alphas_pallas", "backward_betas_pallas",
           "alpha_beta_pallas"]

_NEG_INF = -1e30


def _shift_right(x, k):
    """Shift lanes right by k (toward higher s), filling with -inf."""
    rolled = pltpu.roll(x, k, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= k, rolled, _NEG_INF)


def _shift_left(x, k):
    # pltpu.roll requires non-negative shifts; left-shift by k is a
    # circular right-roll by S-k with the wrapped tail masked off
    if k >= x.shape[1]:
        # everything shifts out (S=1 extended width, i.e. empty labels)
        return jnp.full_like(x, _NEG_INF)
    rolled = pltpu.roll(x, x.shape[1] - k, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < x.shape[1] - k, rolled, _NEG_INF)


def _alpha_kernel(lens_ref, skip_ref, lp_ref, alphas_ref, a_scr,
                  *, t_max: int):
    t = pl.program_id(0)
    lp = lp_ref[0]                        # [B, S]
    col = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)

    @pl.when(t == 0)
    def _init():
        a_scr[:] = jnp.where(col <= 1, lp, _NEG_INF)

    @pl.when(t > 0)
    def _step():
        a = a_scr[:]
        prev = jnp.logaddexp(a, _shift_right(a, 1))
        prev = jnp.logaddexp(
            prev, jnp.where(skip_ref[:] > 0, _shift_right(a, 2), _NEG_INF))
        new = jnp.maximum(prev + lp, _NEG_INF)
        valid = lens_ref[:] > t           # [B, 1]
        a_scr[:] = jnp.where(valid, new, a)

    alphas_ref[0] = a_scr[:]


def _beta_kernel(lens_ref, skipd_ref, lp_ref, idx_last_ref, betas_ref,
                 b_scr, *, t_max: int):
    step = pl.program_id(0)
    t = t_max - 1 - step
    lp = lp_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)

    @pl.when(step == 0)
    def _init():
        b_scr[:] = jnp.full_like(b_scr, _NEG_INF)

    b = b_scr[:]
    nxt = jnp.logaddexp(b, _shift_left(b, 1))
    nxt = jnp.logaddexp(
        nxt, jnp.where(skipd_ref[:] > 0, _shift_left(b, 2), _NEG_INF))
    new = jnp.maximum(nxt + lp, _NEG_INF)
    # per-utterance init at its own last frame: terminal states get lp
    init_row = jnp.where(
        (col == idx_last_ref[:]) | (col == idx_last_ref[:] - 1),
        lp, _NEG_INF)
    is_last = lens_ref[:] == (t + 1)      # [B, 1]
    valid = lens_ref[:] > t
    out = jnp.where(is_last, init_row, jnp.where(valid, new, b))
    b_scr[:] = out
    betas_ref[0] = out


def _alpha_beta_kernel(lens_ref, skip_ref, skipd_ref, idx_last_ref,
                       lp_a_ref, lp_b_ref, alphas_ref, betas_ref,
                       a_scr, b_scr, *, t_max: int):
    """Fused sweep: grid step i advances alpha at t=i AND beta at
    t=t_max-1-i.  The two recursions are independent, so running them in
    the same sequential grid halves the recursion's wall-clock versus two
    back-to-back kernels (the sweep is latency-bound: tiny [B, S] rows)."""
    i = pl.program_id(0)

    # ---- alpha at t = i (identical math to _alpha_kernel) ----
    lp = lp_a_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 1)

    @pl.when(i == 0)
    def _init_a():
        a_scr[:] = jnp.where(col <= 1, lp, _NEG_INF)

    @pl.when(i > 0)
    def _step_a():
        a = a_scr[:]
        prev = jnp.logaddexp(a, _shift_right(a, 1))
        prev = jnp.logaddexp(
            prev, jnp.where(skip_ref[:] > 0, _shift_right(a, 2), _NEG_INF))
        new = jnp.maximum(prev + lp, _NEG_INF)
        valid = lens_ref[:] > i
        a_scr[:] = jnp.where(valid, new, a)

    alphas_ref[0] = a_scr[:]

    # ---- beta at t = t_max - 1 - i (identical math to _beta_kernel) ----
    t = t_max - 1 - i
    lpb = lp_b_ref[0]

    @pl.when(i == 0)
    def _init_b():
        b_scr[:] = jnp.full_like(b_scr, _NEG_INF)

    b = b_scr[:]
    nxt = jnp.logaddexp(b, _shift_left(b, 1))
    nxt = jnp.logaddexp(
        nxt, jnp.where(skipd_ref[:] > 0, _shift_left(b, 2), _NEG_INF))
    new_b = jnp.maximum(nxt + lpb, _NEG_INF)
    init_row = jnp.where(
        (col == idx_last_ref[:]) | (col == idx_last_ref[:] - 1),
        lpb, _NEG_INF)
    is_last = lens_ref[:] == (t + 1)
    valid_b = lens_ref[:] > t
    out = jnp.where(is_last, init_row, jnp.where(valid_b, new_b, b))
    b_scr[:] = out
    betas_ref[0] = out


def alpha_beta_pallas(lp_ext_t, skip_ok, skip_down, lens, label_lens,
                      interpret=False):
    """Fused alpha+beta recursions in one kernel pass.

    Returns (alphas [T, B, S], betas [T, B, S])."""
    t_max, b, s = lp_ext_t.shape
    kern = functools.partial(_alpha_beta_kernel, t_max=t_max)
    idx_last = (2 * label_lens).astype(jnp.int32)[:, None]
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # lens [B,1] f32
            pl.BlockSpec((b, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # skip_ok
            pl.BlockSpec((b, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # skip_down
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # idx_last
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # lp for alpha
            pl.BlockSpec((1, b, s), lambda i: (t_max - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),   # lp for beta
        ],
        out_specs=[
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, s), lambda i: (t_max - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
                   jax.ShapeDtypeStruct((t_max, b, s), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32),
                        pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None], skip_ok.astype(jnp.float32),
      skip_down.astype(jnp.float32), idx_last.astype(jnp.int32),
      lp_ext_t, lp_ext_t)


def forward_alphas_pallas(lp_ext_t, skip_ok, lens, interpret=False):
    """Alpha recursion. lp_ext_t: [T, B, S]; skip_ok: [B, S] bool;
    lens: [B]. Returns alphas [T, B, S]."""
    t_max, b, s = lp_ext_t.shape
    kern = functools.partial(_alpha_kernel, t_max=t_max)
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # lens [B,1] f32
            pl.BlockSpec((b, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # skip_ok [B,S] f32
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # lp_ext
        ],
        out_specs=pl.BlockSpec((1, b, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None],
      skip_ok.astype(jnp.float32), lp_ext_t)


def backward_betas_pallas(lp_ext_t, skip_down, lens, label_lens,
                          interpret=False):
    """Beta recursion. Returns betas [T, B, S]."""
    t_max, b, s = lp_ext_t.shape
    kern = functools.partial(_beta_kernel, t_max=t_max)
    idx_last = (2 * label_lens).astype(jnp.int32)[:, None]
    return pl.pallas_call(
        kern,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # lens
            pl.BlockSpec((b, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # skip_down
            pl.BlockSpec((1, b, s), lambda i: (t_max - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),   # lp_ext reversed
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # idx_last
        ],
        out_specs=pl.BlockSpec((1, b, s), lambda i: (t_max - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(lens.astype(jnp.float32)[:, None],
      skip_down.astype(jnp.float32), lp_ext_t,
      idx_last.astype(jnp.int32))
