"""Pallas fused GRU kernel vs the lax.scan reference implementation.

Same parity strategy as test_rnn_pallas.py (the GPU-vs-CPU test analogue),
in interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.ops.gru_pallas import gru_seq_fwd, gru_sequence

B, T, H = 8, 12, 16


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x_proj = jnp.asarray(rng.standard_normal((T, B, 3 * H)).astype(np.float32))
    w_h = jnp.asarray(
        (rng.standard_normal((H, 3 * H)) * 0.3).astype(np.float32))
    lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))
    return x_proj, w_h, lens


def _scan_gru(x_proj, w_h, lens, reverse):
    """The ops.rnn linear-before-reset scan path on a precomputed proj."""
    t_max, b, g3 = x_proj.shape
    h_dim = g3 // 3
    valid = (jnp.arange(t_max)[:, None] < lens[None, :])[..., None]

    def step(h, inp):
        xp, v = inp
        h_proj = h @ w_h
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_new = jnp.where(v, h_new, h)
        return h_new, jnp.where(v, h_new, 0.0)

    init = jnp.zeros((b, h_dim))
    _, ys = jax.lax.scan(step, init, (x_proj, valid), reverse=reverse)
    return ys


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_parity(reverse):
    x_proj, w_h, lens = _setup(0)
    y_pallas = gru_seq_fwd(x_proj, w_h, lens, reverse, interpret=True)
    y_scan = _scan_gru(x_proj, w_h, lens, reverse)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradient_parity(reverse):
    x_proj, w_h, lens = _setup(1)
    rng = np.random.default_rng(2)
    dy_seed = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))

    def loss_pallas(xp, wh):
        y = gru_sequence(xp, wh, lens, reverse, True)
        return jnp.sum(y * dy_seed)

    def loss_scan(xp, wh):
        y = _scan_gru(xp, wh, lens, reverse)
        return jnp.sum(y * dy_seed)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_h)
    gs = jax.grad(loss_scan, argnums=(0, 1))(x_proj, w_h)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               rtol=2e-4, atol=2e-5)


def test_finite_difference_weight_grad():
    x_proj, w_h, lens = _setup(3)

    def loss(wh):
        return jnp.sum(gru_sequence(x_proj, wh, lens, False, True) ** 2)

    g = np.asarray(jax.grad(loss)(w_h))
    rng = np.random.default_rng(4)
    for _ in range(4):
        i, j = rng.integers(H), rng.integers(3 * H)
        eps = 1e-2
        wp = w_h.at[i, j].add(eps)
        wm = w_h.at[i, j].add(-eps)
        fd = (float(loss(wp)) - float(loss(wm))) / (2 * eps)
        assert abs(fd - g[i, j]) < 5e-2 * max(abs(fd), 1.0), (fd, g[i, j])


class TestFusedBidirectionalGru:
    def _setup2(self, seed=7, B=6, T=10, H=12, D=9):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        w_x = jnp.asarray(
            (rng.standard_normal((D, 6 * H)) * 0.3).astype(np.float32))
        bias = jnp.asarray(
            (rng.standard_normal(6 * H) * 0.1).astype(np.float32))
        w_f = jnp.asarray(
            (rng.standard_normal((H, 3 * H)) * 0.3).astype(np.float32))
        w_b = jnp.asarray(
            (rng.standard_normal((H, 3 * H)) * 0.3).astype(np.float32))
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))
        return x, w_x, bias, w_f, w_b, lens

    @staticmethod
    def _proj(x, w_x, bias, half, H):
        g3 = 3 * H
        sl = slice(0, g3) if half == 0 else slice(g3, 6 * H)
        return x @ w_x[:, sl] + bias[sl]

    def test_forward_matches_two_unidirectional(self):
        from kaldi_ctc_tpu.ops.gru_pallas import bigru_layer
        x, w_x, bias, w_f, w_b, lens = self._setup2()
        H2 = w_f.shape[0]
        y_f, y_b = bigru_layer(x, w_x, bias, w_f, w_b, lens,
                               interpret=True)
        ref_f = gru_sequence(self._proj(x, w_x, bias, 0, H2), w_f, lens,
                             False, True)
        ref_b = gru_sequence(self._proj(x, w_x, bias, 1, H2), w_b, lens,
                             True, True)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(ref_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(ref_b),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("H2", [12, 128])
    def test_gradient_matches_two_unidirectional(self, H2):
        """H2=128 → 3H % 128 == 0 exercises the zero-copy fused views;
        H2=12 exercises the split fallback."""
        from kaldi_ctc_tpu.ops.gru_pallas import bigru_layer
        x, w_x, bias, w_f, w_b, lens = self._setup2(8, H=H2)

        def loss_fused(x, w_x, bias, wf, wb):
            y_f, y_b = bigru_layer(x, w_x, bias, wf, wb, lens, True)
            return jnp.sum(y_f ** 2) + jnp.sum(jnp.cos(y_b))

        def loss_split(x, w_x, bias, wf, wb):
            y_f = gru_sequence(self._proj(x, w_x, bias, 0, H2), wf, lens,
                               False, True)
            y_b = gru_sequence(self._proj(x, w_x, bias, 1, H2), wb, lens,
                               True, True)
            return jnp.sum(y_f ** 2) + jnp.sum(jnp.cos(y_b))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        g2 = jax.grad(loss_split, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_rnn_forward_fused_bgru_matches_xla(self):
        from kaldi_ctc_tpu.ops import gru_pallas
        from kaldi_ctc_tpu.ops.rnn import (
            RnnConfig, RnnMode, init_rnn_params, rnn_forward)

        B, T, H, D = 5, 9, 8, 6
        cfg = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                        mode=RnnMode.GRU, bidirectional=True,
                        implementation="xla")
        params = init_rnn_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))
        ref = rnn_forward(params, x, cfg, lens)
        orig = gru_pallas.bigru_layer
        try:
            gru_pallas.bigru_layer = (
                lambda x, wx, b, wf, wb, l, interpret=False,
                compute_dtype="float32":
                orig(x, wx, b, wf, wb, l, True, compute_dtype))
            cfg_p = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                              mode=RnnMode.GRU, bidirectional=True,
                              implementation="pallas")
            got = rnn_forward(params, x, cfg_p, lens)
        finally:
            gru_pallas.bigru_layer = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
