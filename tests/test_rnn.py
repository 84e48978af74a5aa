"""Recurrent stack tests.

Analogue of nnet2/nnet-component-test.cc's derivative checks plus parity
against an independent per-timestep numpy implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.ops.rnn import (
    RnnConfig,
    RnnMode,
    init_rnn_params,
    rnn_forward,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _naive_lstm(x, lens, p, h_dim, reverse=False):
    """Per-timestep numpy LSTM, one direction. x: [T, B, D]."""
    t_max, b, _ = x.shape
    w_x, w_h, bias = (np.asarray(p["w_x"], np.float64),
                      np.asarray(p["w_h"], np.float64),
                      np.asarray(p["b"], np.float64))
    h = np.zeros((b, h_dim))
    c = np.zeros((b, h_dim))
    out = np.zeros((t_max, b, h_dim))
    order = range(t_max - 1, -1, -1) if reverse else range(t_max)
    for t in order:
        gates = x[t].astype(np.float64) @ w_x + h @ w_h + bias
        i, f, g, o = np.split(gates, 4, axis=-1)
        i, f, o = _sigmoid(i), _sigmoid(f), _sigmoid(o)
        g = np.tanh(g)
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        v = (t < lens)[:, None]
        h = np.where(v, h_new, h)
        c = np.where(v, c_new, c)
        out[t] = np.where(v, h, 0.0)
    return out


def test_lstm_matches_naive():
    cfg = RnnConfig(input_dim=6, hidden_dim=5, num_layers=1,
                    mode=RnnMode.LSTM, bidirectional=False)
    params = init_rnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 3, 6)).astype(np.float32)
    lens = np.asarray([7, 5, 3])
    got = np.asarray(rnn_forward(params, jnp.asarray(x), cfg,
                                 jnp.asarray(lens)))
    want = _naive_lstm(x, lens, params[0]["dirs"][0], 5)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_blstm_matches_naive_both_directions():
    cfg = RnnConfig(input_dim=4, hidden_dim=3, num_layers=1,
                    mode=RnnMode.LSTM, bidirectional=True)
    params = init_rnn_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 2, 4)).astype(np.float32)
    lens = np.asarray([6, 4])
    got = np.asarray(rnn_forward(params, jnp.asarray(x), cfg,
                                 jnp.asarray(lens)))
    fwd = _naive_lstm(x, lens, params[0]["dirs"][0], 3)
    bwd = _naive_lstm(x, lens, params[0]["dirs"][1], 3, reverse=True)
    np.testing.assert_allclose(got[..., :3], fwd, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got[..., 3:], bwd, rtol=2e-3, atol=2e-4)


def test_backward_direction_ignores_pad_frames():
    """Masked recurrence: pad frames must not affect the backward pass."""
    cfg = RnnConfig(input_dim=4, hidden_dim=3, num_layers=2,
                    mode=RnnMode.LSTM, bidirectional=True)
    params = init_rnn_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 2, 4)).astype(np.float32)
    lens = jnp.asarray([8, 5])
    y1 = rnn_forward(params, jnp.asarray(x), cfg, lens)
    x2 = x.copy()
    x2[5:, 1, :] = 99.0  # garbage in utt1's pad region
    y2 = rnn_forward(params, jnp.asarray(x2), cfg, lens)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)
    # outputs at pad frames are zero
    np.testing.assert_array_equal(np.asarray(y1)[5:, 1, :], 0.0)


@pytest.mark.parametrize("mode", [RnnMode.RELU, RnnMode.TANH, RnnMode.GRU,
                                  RnnMode.LSTM])
def test_modes_run_and_differentiate(mode):
    cfg = RnnConfig(input_dim=5, hidden_dim=4, num_layers=2, mode=mode,
                    bidirectional=True)
    params = init_rnn_params(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 3, 5))
    lens = jnp.asarray([6, 4, 2])

    def loss_fn(p):
        return jnp.sum(rnn_forward(p, x, cfg, lens) ** 2)

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_gru_finite_difference():
    cfg = RnnConfig(input_dim=3, hidden_dim=2, num_layers=1,
                    mode=RnnMode.GRU, bidirectional=False,
                    param_stddev=0.5)
    params = init_rnn_params(jax.random.PRNGKey(5), cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 2, 3))
    lens = jnp.asarray([4, 3])

    def loss_fn(w_h):
        p = [{"dirs": [{**params[0]["dirs"][0], "w_h": w_h}]}]
        return jnp.sum(rnn_forward(p, x, cfg, lens) ** 2)

    w_h = params[0]["dirs"][0]["w_h"]
    grad = np.asarray(jax.grad(loss_fn)(w_h))
    rng = np.random.default_rng(3)
    eps = 1e-3
    for _ in range(5):
        i, j = rng.integers(w_h.shape[0]), rng.integers(w_h.shape[1])
        wp = np.asarray(w_h).copy(); wp[i, j] += eps
        wm = np.asarray(w_h).copy(); wm[i, j] -= eps
        fd = (float(loss_fn(jnp.asarray(wp)))
              - float(loss_fn(jnp.asarray(wm)))) / (2 * eps)
        np.testing.assert_allclose(grad[i, j], fd, rtol=2e-2, atol=1e-4)


def test_stack_shapes():
    cfg = RnnConfig(input_dim=40, hidden_dim=16, num_layers=3,
                    mode=RnnMode.LSTM, bidirectional=True)
    params = init_rnn_params(jax.random.PRNGKey(7), cfg)
    x = jnp.zeros((10, 4, 40))
    y = rnn_forward(params, x, cfg)
    assert y.shape == (10, 4, 32)
    # parameter shapes: layer 0 input 40, layers 1-2 input 32
    assert params[0]["dirs"][0]["w_x"].shape == (40, 64)
    assert params[1]["dirs"][0]["w_x"].shape == (32, 64)
    assert params[1]["dirs"][0]["w_h"].shape == (16, 64)
