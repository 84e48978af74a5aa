"""Front-layer nonlinearity family (nnet2 nonlinear components).

Covers the component types the CTC recipe itself never instantiates but
the nnet2 framework offers (nnet2/nnet-component.h: Maxout :411,
Pnorm :514, Normalize :555, Sigmoid :585, Tanh :610, ReLU :676), exposed
here as AmConfig.front_nonlin/front_group on the FT front layer.
"""

import numpy as np
import pytest

NONLINS = ["relu", "tanh", "sigmoid", "pnorm", "maxout"]


def _cfg(nonlin, group=1):
    from kaldi_ctc_tpu.models import AmConfig
    from kaldi_ctc_tpu.ops.rnn import RnnMode
    return AmConfig(input_dim=8, num_targets=6, hidden_dim=16,
                    num_layers=1, mode=RnnMode.LSTM, bidirectional=False,
                    front_affine_dim=12, front_nonlin=nonlin,
                    front_group=group)


@pytest.mark.parametrize("nonlin", NONLINS)
def test_forward_shape_and_grad(nonlin):
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.models import am_forward, init_am_params

    group = 3 if nonlin in ("pnorm", "maxout") else 1
    cfg = _cfg(nonlin, group)
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    assert params["front_w"].shape == (8, 12 * group)
    b, t = 2, 10
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, t, 8)), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)

    def loss(p):
        logits = am_forward(p, feats, cfg, input_lens=lens)
        assert logits.shape == (b, t, 6)
        return jnp.sum(logits ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_pnorm_reduces_groups():
    """pnorm output is the L2 norm over each group (PnormComponent p=2)."""
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.models import am_forward, init_am_params

    cfg = _cfg("pnorm", group=2)
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    # make the front affine the identity into 24 dims so the group math
    # is directly observable: w = [I_8; zeros], b = fixed pattern
    w = np.zeros((8, 24), np.float32)
    b = np.arange(24, dtype=np.float32) / 10.0
    params = dict(params, front_w=jnp.asarray(w), front_b=jnp.asarray(b))
    feats = jnp.zeros((1, 3, 8), jnp.float32)
    taps = {}
    logits = am_forward(params, feats, cfg,
                        input_lens=jnp.full((1,), 3, jnp.int32),
                        taps=taps)
    # with zero input the affine output is exactly b; pnorm groups of 2
    expected = np.sqrt((b.reshape(12, 2) ** 2).sum(-1) + 1e-20)
    expected = expected / np.sqrt((expected ** 2).mean() + 1e-20)
    front = np.asarray(taps["front_out"])  # [T, B, 12]
    assert front.shape == (3, 1, 12)
    np.testing.assert_allclose(front[0, 0], expected, rtol=1e-5)
    np.testing.assert_allclose(front[2, 0], expected, rtol=1e-5)
    assert np.isfinite(np.asarray(logits)).all()


def test_maxout_learns_tiny_mapping():
    """A maxout front layer trains end-to-end (loss decreases)."""
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.models import init_am_params
    from kaldi_ctc_tpu.training import (
        TrainOptions, build_train_step, init_train_state)

    cfg = _cfg("maxout", group=2)
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t, lmax = 4, 12, 2
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
        "labels": jnp.asarray(rng.integers(1, 6, (b, lmax)), jnp.int32),
        "input_lens": jnp.full((b,), t, jnp.int32),
        "label_lens": jnp.full((b,), lmax, jnp.int32),
    }
    step = jax.jit(build_train_step(
        cfg, TrainOptions(initial_learning_rate=0.05,
                          final_learning_rate=0.05, num_steps=30)))
    state = init_train_state(params)
    state, m0 = step(state, batch)
    first = float(m0["loss_total"])
    for _ in range(29):
        state, m = step(state, batch)
    last = float(m["loss_total"])
    assert np.isfinite(last) and last < first


@pytest.mark.parametrize("nonlin", ["pnorm", "maxout"])
def test_natural_gradient_with_grouped_front(nonlin):
    """--affine-type natural composes with pnorm/maxout fronts.

    Regression: the NG front update reshaped the probe gradient to
    front_affine_dim, but the probe/affine output width is front_out_dim
    (= front_affine_dim * front_group), crashing at trace time."""
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.models import init_am_params
    from kaldi_ctc_tpu.training import (
        TrainOptions, build_train_step, init_train_state)

    cfg = _cfg(nonlin, group=2)
    opts = TrainOptions(initial_learning_rate=0.02,
                        final_learning_rate=0.02, num_steps=4,
                        affine_type="natural", ng_rank_in=4, ng_rank_out=4)
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, t, lmax = 3, 10, 2
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
        "labels": jnp.asarray(rng.integers(1, 6, (b, lmax)), jnp.int32),
        "input_lens": jnp.full((b,), t, jnp.int32),
        "label_lens": jnp.full((b,), lmax, jnp.int32),
    }
    step = jax.jit(build_train_step(cfg, opts))
    state = init_train_state(params, opts)
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss_total"]))
    # the NG-updated front weight must keep its (spliced, out_dim) shape
    assert state.params["front_w"].shape == (8, 24)
