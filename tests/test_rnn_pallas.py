"""Pallas fused LSTM kernel vs the lax.scan reference implementation.

The analogue of the reference's GPU-vs-CPU parity tests
(cudamatrix/cu-matrix-test.cc): same math, two implementations.  Runs in
Pallas interpreter mode on the CPU test mesh; the compiled path is
exercised on real TPU by bench.py.
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
from kaldi_ctc_tpu.ops.rnn_pallas import lstm_seq_fwd, lstm_sequence

B, T, H, D = 8, 12, 16, 10


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x_proj = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    w_h = jnp.asarray(
        (rng.standard_normal((H, 4 * H)) * 0.3).astype(np.float32))
    lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))
    return x_proj, w_h, lens


def _scan_lstm(x_proj, w_h, lens, reverse):
    """The ops.rnn scan path, directly on a precomputed projection."""
    t_max, b, g4 = x_proj.shape
    h_dim = g4 // 4
    valid = (jnp.arange(t_max)[:, None] < lens[None, :])[..., None]

    def step(carry, inp):
        h, c = carry
        xp, v = inp
        gates = xp + h @ w_h
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h_new = jnp.where(v, h_new, h)
        c_new = jnp.where(v, c_new, c)
        return (h_new, c_new), jnp.where(v, h_new, 0.0)

    init = (jnp.zeros((b, h_dim)), jnp.zeros((b, h_dim)))
    _, ys = jax.lax.scan(step, init, (x_proj, valid), reverse=reverse)
    return ys


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_parity(reverse):
    x_proj, w_h, lens = _setup(0)
    y_pallas, c_seq = lstm_seq_fwd(x_proj, w_h, lens, reverse,
                                   interpret=True)
    y_scan = _scan_lstm(x_proj, w_h, lens, reverse)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradient_parity(reverse):
    x_proj, w_h, lens = _setup(1)
    dy_seed = jnp.asarray(
        np.random.default_rng(2).standard_normal((T, B, H)).astype(np.float32))

    def loss_pallas(xp, wh):
        y = lstm_sequence(xp, wh, lens, reverse, True)
        return jnp.sum(y * dy_seed)

    def loss_scan(xp, wh):
        return jnp.sum(_scan_lstm(xp, wh, lens, reverse) * dy_seed)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_h)
    gs = jax.grad(loss_scan, argnums=(0, 1))(x_proj, w_h)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               rtol=1e-4, atol=1e-4)


def test_rnn_forward_pallas_impl_matches_xla():
    cfg_x = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                      mode=RnnMode.LSTM, bidirectional=True,
                      implementation="xla")
    params = init_rnn_params(jax.random.PRNGKey(0), cfg_x)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((T, 4, D)).astype(np.float32))
    lens = jnp.asarray([12, 9, 5, 12], dtype=jnp.int32)
    y_xla = rnn_forward(params, x, cfg_x, lens)

    import kaldi_ctc_tpu.ops.rnn_pallas as rp
    orig = rp.lstm_sequence

    # route the pallas path through interpret mode for CPU testing
    def interp(x_proj, w_h, l, reverse=False, interpret=False):
        return orig(x_proj, w_h, l, reverse, True)

    cfg_p = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                      mode=RnnMode.LSTM, bidirectional=True,
                      implementation="pallas")
    bi_backup = rp.bilstm_layer

    def interp_bi(x, wx, b, wf, wb, l, interpret=False,
                  compute_dtype="float32"):
        return bi_backup(x, wx, b, wf, wb, l, True, compute_dtype)

    rp_backup = rp.lstm_sequence
    rp.lstm_sequence = interp
    rp.bilstm_layer = interp_bi
    try:
        y_pal = rnn_forward(params, x, cfg_p, lens)
    finally:
        rp.lstm_sequence = rp_backup
        rp.bilstm_layer = bi_backup
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=1e-5, atol=1e-6)


class TestFusedBidirectional:
    def _setup2(self, seed=4):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        w_x = jnp.asarray(
            (rng.standard_normal((D, 8 * H)) * 0.3).astype(np.float32))
        bias = jnp.asarray(
            (rng.standard_normal(8 * H) * 0.1).astype(np.float32))
        w_f = jnp.asarray(
            (rng.standard_normal((H, 4 * H)) * 0.3).astype(np.float32))
        w_b = jnp.asarray(
            (rng.standard_normal((H, 4 * H)) * 0.3).astype(np.float32))
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))
        return x, w_x, bias, w_f, w_b, lens

    @staticmethod
    def _proj(x, w_x, bias, half):
        g4 = 4 * H
        sl = slice(0, g4) if half == 0 else slice(g4, 8 * H)
        return x @ w_x[:, sl] + bias[sl]

    def test_forward_matches_two_unidirectional(self):
        from kaldi_ctc_tpu.ops.rnn_pallas import bilstm_layer
        x, w_x, bias, w_f, w_b, lens = self._setup2()
        y_f, y_b = bilstm_layer(x, w_x, bias, w_f, w_b, lens,
                                interpret=True)
        ref_f = lstm_sequence(self._proj(x, w_x, bias, 0), w_f, lens,
                              False, True)
        ref_b = lstm_sequence(self._proj(x, w_x, bias, 1), w_b, lens,
                              True, True)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(ref_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(ref_b),
                                   rtol=1e-5, atol=1e-5)

    def test_gradient_matches_two_unidirectional(self):
        from kaldi_ctc_tpu.ops.rnn_pallas import bilstm_layer
        x, w_x, bias, w_f, w_b, lens = self._setup2(5)

        def loss_fused(x, w_x, bias, wf, wb):
            y_f, y_b = bilstm_layer(x, w_x, bias, wf, wb, lens, True)
            return jnp.sum(y_f ** 2) + jnp.sum(jnp.cos(y_b))

        def loss_split(x, w_x, bias, wf, wb):
            y_f = lstm_sequence(self._proj(x, w_x, bias, 0), wf, lens,
                                False, True)
            y_b = lstm_sequence(self._proj(x, w_x, bias, 1), wb, lens,
                                True, True)
            return jnp.sum(y_f ** 2) + jnp.sum(jnp.cos(y_b))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        g2 = jax.grad(loss_split, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_lane_aligned_fused_views(self):
        """H=32 → 4H=128: the zero-copy fused-projection views (the path
        the flagship model takes on TPU, where 4H % 128 == 0) must match
        the unidirectional kernels in both passes."""
        from kaldi_ctc_tpu.ops.rnn_pallas import bilstm_layer
        H2 = 32
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        w_x = jnp.asarray(
            (rng.standard_normal((D, 8 * H2)) * 0.3).astype(np.float32))
        bias = jnp.asarray(
            (rng.standard_normal(8 * H2) * 0.1).astype(np.float32))
        w_f = jnp.asarray(
            (rng.standard_normal((H2, 4 * H2)) * 0.3).astype(np.float32))
        w_b = jnp.asarray(
            (rng.standard_normal((H2, 4 * H2)) * 0.3).astype(np.float32))
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))

        def proj(x, w_x, bias, half):
            g4 = 4 * H2
            sl = slice(0, g4) if half == 0 else slice(g4, 8 * H2)
            return x @ w_x[:, sl] + bias[sl]

        def loss_fused(x, w_x, bias, wf, wb):
            y_f, y_b = bilstm_layer(x, w_x, bias, wf, wb, lens, True)
            return jnp.sum(y_f ** 2) + jnp.sum(jnp.cos(y_b))

        y_f, y_b = bilstm_layer(x, w_x, bias, w_f, w_b, lens,
                                interpret=True)
        ref_f = lstm_sequence(proj(x, w_x, bias, 0), w_f, lens,
                              False, True)
        ref_b = lstm_sequence(proj(x, w_x, bias, 1), w_b, lens,
                              True, True)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(ref_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(ref_b),
                                   rtol=1e-5, atol=1e-5)

        def loss_split(x, w_x, bias, wf, wb):
            y_f = lstm_sequence(proj(x, w_x, bias, 0), wf, lens,
                                False, True)
            y_b = lstm_sequence(proj(x, w_x, bias, 1), wb, lens,
                                True, True)
            return jnp.sum(y_f ** 2) + jnp.sum(jnp.cos(y_b))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        g2 = jax.grad(loss_split, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
    def test_in_kernel_projection_path(self, dtype):
        """D=128, H=32 → both D and 4H lane-aligned: the in-kernel
        input-projection kernels (x streamed instead of the hoisted
        [T,B,2*4H] projection — the flagship model's inner-layer path on
        TPU) must match the unidirectional kernels fed the hoisted
        projection, in both passes and in both compute dtypes."""
        from kaldi_ctc_tpu.ops import rnn_pallas
        from kaldi_ctc_tpu.ops.rnn_pallas import bilstm_layer
        H2, D2 = 32, 128
        assert rnn_pallas._use_in_kernel_proj(D2, 4 * H2)
        cd = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((T, B, D2)).astype(np.float32))
        w_x = jnp.asarray(
            (rng.standard_normal((D2, 8 * H2)) * 0.2).astype(np.float32)
        ).astype(cd)
        bias = jnp.asarray(
            (rng.standard_normal(8 * H2) * 0.1).astype(np.float32))
        w_f = jnp.asarray(
            (rng.standard_normal((H2, 4 * H2)) * 0.3).astype(np.float32)
        ).astype(cd)
        w_b = jnp.asarray(
            (rng.standard_normal((H2, 4 * H2)) * 0.3).astype(np.float32)
        ).astype(cd)
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))

        def proj(x, w_x, bias, half):
            g4 = 4 * H2
            sl = slice(0, g4) if half == 0 else slice(g4, 8 * H2)
            p = (jnp.dot(x.reshape(-1, D2).astype(w_x.dtype), w_x[:, sl],
                         preferred_element_type=jnp.float32)
                 + bias[sl]).astype(w_x.dtype)
            return p.reshape(T, B, -1)

        y_f, y_b = bilstm_layer(x, w_x, bias, w_f, w_b, lens,
                                interpret=True)
        ref_f = lstm_sequence(proj(x, w_x, bias, 0), w_f, lens,
                              False, True)
        ref_b = lstm_sequence(proj(x, w_x, bias, 1), w_b, lens,
                              True, True)
        tol = 1e-5 if dtype == np.float32 else 5e-2
        np.testing.assert_allclose(
            np.asarray(y_f, np.float32), np.asarray(ref_f, np.float32),
            rtol=tol, atol=tol)
        np.testing.assert_allclose(
            np.asarray(y_b, np.float32), np.asarray(ref_b, np.float32),
            rtol=tol, atol=tol)

        def loss_fused(x, w_x, bias, wf, wb):
            y_f, y_b = bilstm_layer(x, w_x, bias, wf, wb, lens, True)
            return (jnp.sum(y_f.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.cos(y_b.astype(jnp.float32))))

        def loss_split(x, w_x, bias, wf, wb):
            y_f = lstm_sequence(proj(x, w_x, bias, 0), wf, lens,
                                False, True)
            y_b = lstm_sequence(proj(x, w_x, bias, 1), wb, lens,
                                True, True)
            return (jnp.sum(y_f.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.cos(y_b.astype(jnp.float32))))

        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        g2 = jax.grad(loss_split, argnums=(0, 1, 2, 3, 4))(
            x, w_x, bias, w_f, w_b)
        gtol = 1e-4 if dtype == np.float32 else 1e-1
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=gtol, atol=gtol)

    def test_bf16_mode_pallas_matches_scan(self):
        """bfloat16 compute dtype: the Pallas layer and the scan path
        quantize at the same points (bf16-stored projection, bf16 matmul
        operands, f32 gate math and carries), so forwards agree to bf16
        resolution and gradients stay close."""
        import kaldi_ctc_tpu.ops.rnn as R
        from kaldi_ctc_tpu.ops import rnn_pallas

        cfg_x = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                          mode=RnnMode.LSTM, bidirectional=True,
                          implementation="xla", compute_dtype="bfloat16")
        params = init_rnn_params(jax.random.PRNGKey(3), cfg_x)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))

        def loss(params, cfg):
            y = rnn_forward(params, x, cfg, lens).astype(jnp.float32)
            return jnp.sum(y ** 2), y

        (ref_l, ref_y), ref_g = jax.value_and_grad(
            loss, has_aux=True)(params, cfg_x)

        orig = rnn_pallas.bilstm_layer
        try:
            rnn_pallas.bilstm_layer = (
                lambda x, wx, b, wf, wb, l, interpret=False,
                compute_dtype="float32":
                orig(x, wx, b, wf, wb, l, True, compute_dtype))
            cfg_p = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                              mode=RnnMode.LSTM, bidirectional=True,
                              implementation="pallas",
                              compute_dtype="bfloat16")
            (got_l, got_y), got_g = jax.value_and_grad(
                loss, has_aux=True)(params, cfg_p)
        finally:
            rnn_pallas.bilstm_layer = orig
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                                   rtol=0, atol=2e-2)
        for a, b in zip(jax.tree_util.tree_leaves(got_g),
                        jax.tree_util.tree_leaves(ref_g)):
            scale = float(np.abs(np.asarray(b)).max()) + 1e-3
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       rtol=0, atol=5e-2)

    def test_rnn_forward_fused_path_matches_xla(self):
        """rnn_forward with the fused bidirectional dispatch must equal
        the scan path on a full multi-layer BLSTM stack."""
        import kaldi_ctc_tpu.ops.rnn as R
        from kaldi_ctc_tpu.ops import rnn_pallas

        cfg = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                        mode=RnnMode.LSTM, bidirectional=True,
                        implementation="xla")
        params = init_rnn_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        lens = jnp.asarray(rng.integers(3, T + 1, size=B).astype(np.int32))
        ref = rnn_forward(params, x, cfg, lens)

        # force the fused dispatch with the kernels in interpret mode
        orig = rnn_pallas.bilstm_layer
        try:
            rnn_pallas.bilstm_layer = (
                lambda x, wx, b, wf, wb, l, interpret=False,
                compute_dtype="float32":
                orig(x, wx, b, wf, wb, l, True, compute_dtype))
            cfg_p = RnnConfig(input_dim=D, hidden_dim=H, num_layers=2,
                              mode=RnnMode.LSTM, bidirectional=True,
                              implementation="pallas")
            got = rnn_forward(params, x, cfg_p, lens)
        finally:
            rnn_pallas.bilstm_layer = orig
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
