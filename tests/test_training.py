"""End-to-end training slice tests.

The analogue of the reference's de-facto integration test (running the
recipe): a tiny BLSTM-CTC model must overfit a few synthetic utterances to
near-zero loss and decode them exactly (SURVEY §7.2 step 5), single-device
and data-parallel over the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.models import AmConfig, am_forward, init_am_params
from kaldi_ctc_tpu.ops.rnn import RnnMode
from kaldi_ctc_tpu.parallel import make_mesh, shard_batch
from kaldi_ctc_tpu.training import (
    TrainOptions,
    accuracy_from_outputs,
    exponential_lr,
    init_train_state,
    make_eval_step,
    make_train_step,
)


def _synthetic_batch(rng, b, t, d, num_targets, lmax):
    """Utterances where frame features encode the active label (learnable)."""
    label_lens = rng.integers(2, lmax + 1, size=b).astype(np.int32)
    labels = np.zeros((b, lmax), dtype=np.int32)
    feats = rng.standard_normal((b, t, d)).astype(np.float32) * 0.1
    input_lens = np.full(b, t, dtype=np.int32)
    for i in range(b):
        labs = rng.integers(1, num_targets, size=label_lens[i])
        labels[i, : label_lens[i]] = labs
        # paint each label onto a contiguous span of frames
        span = t // label_lens[i]
        for j, lab in enumerate(labs):
            feats[i, j * span : (j + 1) * span, lab % d] += 2.0
    return {
        "feats": feats,
        "labels": labels,
        "input_lens": input_lens,
        "label_lens": label_lens,
    }


CFG = AmConfig(input_dim=8, num_targets=6, hidden_dim=16, num_layers=2,
               mode=RnnMode.LSTM, bidirectional=True)


def test_overfit_tiny():
    rng = np.random.default_rng(0)
    batch_np = _synthetic_batch(rng, b=4, t=24, d=8, num_targets=6, lmax=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    opts = TrainOptions(initial_learning_rate=1e-2, final_learning_rate=1e-3,
                        num_steps=1500, momentum=0.9)
    params = init_am_params(jax.random.PRNGKey(0), CFG)
    state = init_train_state(params)
    step = make_train_step(CFG, opts)
    first = None
    for i in range(1500):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_per_frame"])
    last = float(metrics["loss_per_frame"])
    assert last < 0.01 * first, (first, last)
    acc, err, ref = accuracy_from_outputs(
        metrics, batch_np["labels"], batch_np["label_lens"])
    assert acc == 1.0, (acc, err, ref)


def test_eval_step_matches_train_metrics():
    rng = np.random.default_rng(1)
    batch_np = _synthetic_batch(rng, b=2, t=16, d=8, num_targets=6, lmax=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = init_am_params(jax.random.PRNGKey(1), CFG)
    ev = make_eval_step(CFG)
    out = ev(params, batch)
    assert np.isfinite(float(out["loss_total"]))
    assert int(out["num_frames"]) == 32


def test_data_parallel_matches_single_device():
    """DP over the 8-device CPU mesh must give the same numbers as 1 device."""
    rng = np.random.default_rng(2)
    batch_np = _synthetic_batch(rng, b=8, t=16, d=8, num_targets=6, lmax=3)
    batch_single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    opts = TrainOptions(initial_learning_rate=1e-2, final_learning_rate=1e-2)
    params = init_am_params(jax.random.PRNGKey(2), CFG)

    step = make_train_step(CFG, opts)
    state1, m1 = step(init_train_state(params), batch_single)

    mesh = make_mesh(data=8)
    batch_sharded = shard_batch(batch_np, mesh)
    params2 = init_am_params(jax.random.PRNGKey(2), CFG)
    state2, m2 = step(init_train_state(params2), batch_sharded)

    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tensor_parallel_matches_single_device():
    """data×model (4×2) mesh with the gate/hidden dims sharded over the
    'model' axis must reproduce the single-device step — the SPMD
    correctness gate for the tensor-parallel sharding rules."""
    from kaldi_ctc_tpu.parallel import param_sharding

    rng = np.random.default_rng(4)
    batch_np = _synthetic_batch(rng, b=8, t=16, d=8, num_targets=6, lmax=3)
    batch_single = {k: jnp.asarray(v) for k, v in batch_np.items()}
    opts = TrainOptions(initial_learning_rate=1e-2, final_learning_rate=1e-2)
    params = init_am_params(jax.random.PRNGKey(4), CFG)

    step = make_train_step(CFG, opts)
    state1, m1 = step(init_train_state(params), batch_single)

    mesh = make_mesh(data=4, model=2)
    params2 = init_am_params(jax.random.PRNGKey(4), CFG)
    shardings = param_sharding(mesh, params2, tensor_parallel=True)
    params2 = jax.tree_util.tree_map(jax.device_put, params2, shardings)
    batch_sharded = shard_batch(batch_np, mesh)
    state2, m2 = step(init_train_state(params2), batch_sharded)

    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_exponential_lr_schedule():
    opts = TrainOptions(initial_learning_rate=5e-4, final_learning_rate=1e-5,
                        num_steps=100)
    lr0 = float(exponential_lr(opts, jnp.asarray(0)))
    lr_mid = float(exponential_lr(opts, jnp.asarray(50)))
    lr_end = float(exponential_lr(opts, jnp.asarray(100)))
    np.testing.assert_allclose(lr0, 5e-4, rtol=1e-6)
    np.testing.assert_allclose(lr_end, 1e-5, rtol=1e-5)
    np.testing.assert_allclose(lr_mid, np.sqrt(lr0 * lr_end), rtol=1e-5)


def test_momentum_changes_trajectory():
    rng = np.random.default_rng(3)
    batch_np = _synthetic_batch(rng, b=2, t=16, d=8, num_targets=6, lmax=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s_plain = init_train_state(init_am_params(jax.random.PRNGKey(3), CFG))
    s_mom = init_train_state(init_am_params(jax.random.PRNGKey(3), CFG))
    step_plain = make_train_step(CFG, TrainOptions())
    step_mom = make_train_step(CFG, TrainOptions(momentum=0.9))
    for _ in range(3):
        s_plain, _ = step_plain(s_plain, batch)
        s_mom, _ = step_mom(s_mom, batch)
    a = jax.tree_util.tree_leaves(s_plain.params)[0]
    b = jax.tree_util.tree_leaves(s_mom.params)[0]
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-7


def test_grow_rnn_layer():
    from kaldi_ctc_tpu.models.acoustic import grow_rnn_layer
    params = init_am_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(9)
    batch_np = _synthetic_batch(rng, b=2, t=16, d=8, num_targets=6, lmax=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    p2, cfg2 = grow_rnn_layer(params, CFG, jax.random.PRNGKey(1))
    assert cfg2.num_layers == CFG.num_layers + 1
    assert len(p2["rnn"]) == len(params["rnn"]) + 1
    # the grown model trains
    step = make_train_step(cfg2, TrainOptions())
    state, m = step(init_train_state(p2), batch)
    assert np.isfinite(float(m["loss_total"]))


def test_profiler():
    from kaldi_ctc_tpu.utils import profiling
    p = profiling.Profiler()
    p.enabled = True
    with p.track("a"):
        pass
    with p.track("a"):
        pass
    with p.track("b"):
        pass
    rep = p.report()
    assert rep["a"]["calls"] == 2 and rep["b"]["calls"] == 1
    p.print_profile()
    p.reset()
    assert p.report() == {}
    # disabled: no accumulation
    p.enabled = False
    with p.track("c"):
        pass
    assert "c" not in p.report()


def test_ft_model_with_splice_overfits():
    """The 'FT' model type (make_configs.py:269-279): spliced input ->
    Affine+ReLU+renorm front layer -> RNN stack, must also learn."""
    cfg = AmConfig(input_dim=8, num_targets=6, hidden_dim=16, num_layers=2,
                   mode=RnnMode.LSTM, bidirectional=True,
                   splice_left=2, splice_right=2, front_affine_dim=24)
    rng = np.random.default_rng(7)
    batch_np = _synthetic_batch(rng, b=4, t=24, d=8, num_targets=6, lmax=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    opts = TrainOptions(initial_learning_rate=1e-2,
                        final_learning_rate=1e-3,
                        num_steps=800, momentum=0.9)
    params = init_am_params(jax.random.PRNGKey(7), cfg)
    assert params["front_w"].shape == (8 * 5, 24)
    state = init_train_state(params)
    step = make_train_step(cfg, opts)
    first = None
    for _ in range(800):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_per_frame"])
    last = float(metrics["loss_per_frame"])
    assert last < 0.05 * first, (first, last)
    # forward shape sanity with splice (T unchanged); the step donates
    # its inputs, so use the trained state's params
    logits = am_forward(state.params, batch["feats"], cfg,
                        batch["input_lens"])
    assert logits.shape == (4, 24, 6)


def test_nonfinite_guard_suppresses_update():
    """A NaN batch must leave params+velocity untouched and flag finite=False
    (reference kills the job on non-finite objf, ctc-nnet-update.cc:232-234;
    the on-device guard makes the surviving state clean either way)."""
    rng = np.random.default_rng(3)
    batch_np = _synthetic_batch(rng, b=4, t=24, d=8, num_targets=6, lmax=4)
    opts = TrainOptions(initial_learning_rate=1e-2, final_learning_rate=1e-3,
                        num_steps=100, momentum=0.9)
    params = init_am_params(jax.random.PRNGKey(0), CFG)
    state = init_train_state(params)
    step = make_train_step(CFG, opts)

    # one clean step so velocity is nonzero
    clean = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state, m = step(state, clean)
    assert bool(m["finite"])
    before = jax.device_get(state)

    poisoned = dict(batch_np)
    poisoned["feats"] = batch_np["feats"].copy()
    poisoned["feats"][0, 0, 0] = np.nan
    state, m = step(state, {k: jnp.asarray(v) for k, v in poisoned.items()})
    assert not bool(m["finite"])
    after = jax.device_get(state)
    for a, b in zip(jax.tree_util.tree_leaves(before.params),
                    jax.tree_util.tree_leaves(after.params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(before.velocity),
                    jax.tree_util.tree_leaves(after.velocity)):
        np.testing.assert_array_equal(a, b)
    assert int(after.step) == int(before.step) + 1

    # and a following clean step trains normally from the preserved state
    state, m = step(state, clean)
    assert bool(m["finite"])
    assert np.isfinite(float(m["loss_total"]))


def test_lr_warmup_ramp():
    """warmup_steps > 0: linear ramp to the decayed lr, then the
    reference exponential schedule untouched."""
    import jax.numpy as jnp

    from kaldi_ctc_tpu.training.train import TrainOptions, exponential_lr

    opts = TrainOptions(initial_learning_rate=1e-2,
                        final_learning_rate=1e-3, num_steps=100,
                        warmup_steps=10)
    base = TrainOptions(initial_learning_rate=1e-2,
                        final_learning_rate=1e-3, num_steps=100)
    # step 0 is 1/10 of the decayed lr; step >= warmup matches exactly
    lr0 = float(exponential_lr(opts, jnp.asarray(0)))
    b0 = float(exponential_lr(base, jnp.asarray(0)))
    assert abs(lr0 - 0.1 * b0) < 1e-9
    for s in (10, 50, 99):
        lw = float(exponential_lr(opts, jnp.asarray(s)))
        lb = float(exponential_lr(base, jnp.asarray(s)))
        assert abs(lw - lb) < 1e-12, (s, lw, lb)
