"""Online natural-gradient (NG-SGD) preconditioning for affine layers.

The reference's ``NaturalGradientAffineComponent`` /
``AffineComponentPreconditionedOnline`` (selected by ``--affine-type
natural``, steps/ctc/nnet2/components.py:30-33) preconditions each
affine update with two low-rank-plus-identity approximations of the
Fisher matrix — one over the layer's input rows (bias column appended),
one over its output-derivative rows — maintained online by a power-
method update (src/nnet2/nnet-precondition-online.h:37-260, "Parallel
training of DNNs with Natural Gradient and Parameter Averaging",
Povey et al., ICLR workshop 2015).

This is the same algorithm as a pure-functional JAX transform:

- state per preconditioner: ``W = E^{1/2} R`` [R, D] (R orthonormal
  rows), ``rho`` (identity floor), ``d`` [R] (low-rank eigenvalues),
  ``t`` (update count);
- per minibatch X [N, D]: ``X_hat = X - (X W^T) W`` — two skinny
  matmuls, everything else is R x R and tiny;
- the state update (eqns St..Zt of the header comment) runs an R x R
  symmetric eigendecomposition per call — R is 30-80, so this is host-
  trivial arithmetic that XLA fuses into the step.

Deviation (documented): the reference initializes R_0 from the first
minibatch's top-R eigenvectors (nnet-precondition-online.h "*
Initialization *"); here R_0 is the first R rows of the identity with
d = rho = epsilon.  With the default num_samples_history=2000 and
frame-row minibatches (N in the tens of thousands) eta saturates at
0.9, so the power method reaches the same subspace within a few steps
either way, and the identity start keeps initialization shape-generic
and jit-friendly.  The first ``num_initial_updates=10`` steps always
update (reference nnet-precondition-online.cc:327-329) before
``update_period`` thinning applies.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["NgOptions", "NgState", "ng_init", "ng_precondition",
           "ng_affine_update"]

_EPS = 1.0e-10
_DELTA = 5.0e-04   # relative floor on rho/d (nnet-precondition-online.cc:27)


@dataclasses.dataclass(frozen=True)
class NgOptions:
    """Defaults = the reference's (nnet-component.cc:1684-1685,
    nnet-precondition-online.cc:28)."""

    rank_in: int = 30
    rank_out: int = 80
    update_period: int = 1
    num_samples_history: float = 2000.0
    alpha: float = 4.0


class NgState(NamedTuple):
    w: jnp.ndarray      # [R, D] = E^{1/2} R
    rho: jnp.ndarray    # scalar
    d: jnp.ndarray      # [R]
    t: jnp.ndarray      # scalar int32 update counter


def ng_init(dim: int, rank: int, alpha: float = 4.0) -> NgState:
    """Fresh preconditioner state for D=dim vectors (rank clipped to
    dim-1 as in nnet-component.cc:1626-1627).

    The stored matrix is W = E^{1/2} R, so the identity-rows R_0 is
    scaled by sqrt(e) computed at the d = rho = eps floor — keeping the
    storage convention consistent from the first call."""
    rank = min(rank, dim - 1)
    if rank <= 0:
        raise ValueError(f"rank must be positive (dim {dim})")
    r0 = jnp.zeros((rank, dim), jnp.float32).at[
        jnp.arange(rank), jnp.arange(rank)].set(1.0)
    beta0 = _EPS * (1.0 + alpha) + alpha * rank * _EPS / dim
    e0 = 1.0 / (beta0 / _EPS + 1.0)
    return NgState(w=jnp.sqrt(jnp.float32(e0)) * r0,
                   rho=jnp.float32(_EPS),
                   d=jnp.full((rank,), _EPS, jnp.float32),
                   t=jnp.zeros((), jnp.int32))


def _compute_e(d: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """e_i = 1/(beta/d_i + 1)  (eqn:tii)."""
    return 1.0 / (beta / d + 1.0)


def ng_precondition(
    state: NgState, x: jnp.ndarray, opts: NgOptions,
) -> Tuple[jnp.ndarray, jnp.ndarray, NgState]:
    """→ (x_bar [N, D] preconditioned+renormalized, scale gamma,
    new_state).

    x_bar = gamma * (x - x W^T W); the caller folds gamma into its
    learning rate exactly as PreconditionDirections' ``scale`` output.
    """
    n, dim = x.shape
    r = state.w.shape[0]
    alpha = opts.alpha
    eta = jnp.minimum(
        1.0 - jnp.exp(-n / opts.num_samples_history), 0.9)

    w = state.w
    d_t = state.d
    rho = state.rho

    beta = rho * (1.0 + alpha) + alpha * jnp.sum(d_t) / dim
    e = _compute_e(d_t, beta)
    inv_sqrt_e = 1.0 / jnp.sqrt(e)

    h = x @ w.T                                  # [N, R]
    x_hat = x - h @ w
    row_prod = jnp.sum(x_hat * x_hat, axis=1)
    tr_xhat2 = jnp.sum(row_prod)
    j_t = h.T @ x                                # [R, D]
    k_t = j_t @ j_t.T                            # [R, R]
    l_t = h.T @ h                                # [R, R]
    # tr(X X^T) = tr(Xhat Xhat^T) - tr(L E) + 2 tr(L)   (W W^T = E)
    tr_x2 = tr_xhat2 - jnp.sum(jnp.diag(l_t) * e) + 2.0 * jnp.sum(
        jnp.diag(l_t))
    gamma = jnp.where(tr_xhat2 > 0.0, jnp.sqrt(tr_x2 / jnp.maximum(
        tr_xhat2, 1e-37)), 1.0)

    def updated() -> NgState:
        # Z_t (eqn:Zt), R x R symmetric
        ie = inv_sqrt_e
        dr = d_t + rho
        z = ((eta / n) ** 2 * (ie[:, None] * k_t * ie[None, :])
             + (eta / n) * (1.0 - eta)
             * (ie[:, None] * l_t * ie[None, :] * dr[None, :]
                + dr[:, None] * (ie[:, None] * l_t * ie[None, :]))
             + (1.0 - eta) ** 2 * jnp.diag(dr * dr))
        z = 0.5 * (z + z.T)
        c, u = jnp.linalg.eigh(z)                # ascending
        c = c[::-1]
        u = u[:, ::-1]                           # sorted desc
        c_floor = (rho * (1.0 - eta)) ** 2
        need_reorth = c[0] > 1.0e6 * jnp.maximum(c[-1], 1e-37)
        c = jnp.maximum(c, c_floor)
        sqrt_c = jnp.sqrt(jnp.maximum(c, 1e-37))
        # rho_{t+1} (eqn:rhot1 expanded)
        rho1 = (eta / n * tr_x2
                + (1.0 - eta) * (dim * rho + jnp.sum(d_t))
                - jnp.sum(sqrt_c)) / (dim - r)
        d1 = sqrt_c - rho1
        # positive floor keeps every e_i in (0,1) so sqrt(e) is always
        # real (nnet-precondition-online.cc:452-456: floor_val =
        # max(epsilon, delta * sqrt_c.max()), applied to rho and d)
        floor_val = jnp.maximum(_EPS, _DELTA * sqrt_c[0])
        rho1 = jnp.maximum(rho1, floor_val)
        d1 = jnp.maximum(d1, floor_val)
        beta1 = rho1 * (1.0 + alpha) + alpha * jnp.sum(d1) / dim
        e1 = _compute_e(d1, beta1)
        sqrt_e1 = jnp.sqrt(e1)
        # W_{t+1} = A B (ComputeWt1): A [R,R] tiny, B [R,D]
        a = (eta / n) * (sqrt_e1[:, None] / sqrt_c[:, None]) \
            * u.T * inv_sqrt_e[None, :]
        b = j_t + ((1.0 - eta) * n / eta) * dr[:, None] * w
        w1 = a @ b
        # re-orthogonalize R_{t+1} when C_t was ill-conditioned
        # (nnet-precondition-online.h "* Keeping R_t orthogonal *")
        inv_sqrt_e1 = 1.0 / sqrt_e1
        o = (inv_sqrt_e1[:, None] * (w1 @ w1.T)) * inv_sqrt_e1[None, :]
        chol = jnp.linalg.cholesky(
            o + 1e-12 * jnp.eye(r, dtype=o.dtype))
        m = jax.scipy.linalg.solve_triangular(
            chol, jnp.diag(inv_sqrt_e1), lower=True)
        w_fixed = (sqrt_e1[:, None] * m) @ w1
        ok = jnp.all(jnp.isfinite(w_fixed))
        w1 = jnp.where(need_reorth & ok, w_fixed, w1)
        return NgState(w=w1, rho=rho1, d=d1, t=state.t + 1)

    def skipped() -> NgState:
        return state._replace(t=state.t + 1)

    # always update for the first 10 calls, then every update_period
    # (nnet-precondition-online.cc:327-329)
    do_update = (state.t < 10) | (
        state.t % jnp.int32(max(opts.update_period, 1)) == 0)
    new_state = jax.lax.cond(do_update, updated, skipped)
    return gamma * x_hat, gamma, new_state


def ng_affine_update(
    ng_in: NgState, ng_out: NgState,
    x: jnp.ndarray,            # [N, D_in] layer input rows
    dy: jnp.ndarray,           # [N, D_out] pre-activation derivative rows
    opts: NgOptions,
) -> Tuple[jnp.ndarray, jnp.ndarray, NgState, NgState]:
    """→ (grad_w [D_in, D_out], grad_b [D_out], ng_in', ng_out').

    The AffineComponentPreconditionedOnline::Update recipe
    (nnet-component.cc: append a 1.0 bias column to the inputs,
    precondition inputs and output-derivs independently, form the
    outer-product update from the preconditioned factors).  Output
    orientation matches this repo's [in, out] weight storage.
    """
    n = x.shape[0]
    x_ext = jnp.concatenate(
        [x, jnp.ones((n, 1), x.dtype)], axis=1)
    x_bar, in_scale, ng_in = ng_precondition(ng_in, x_ext, opts)
    dy_bar, out_scale, ng_out = ng_precondition(ng_out, dy, opts)
    # gamma scales are already folded into x_bar/dy_bar; in_scale and
    # out_scale are returned by ng_precondition pre-applied, so no
    # extra factor here (the reference keeps them separate only to
    # save GPU kernel launches)
    grad_w = x_bar[:, :-1].T @ dy_bar
    grad_b = x_bar[:, -1] @ dy_bar
    return grad_w, grad_b, ng_in, ng_out
