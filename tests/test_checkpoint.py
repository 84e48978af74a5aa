"""Checkpoint save/restore/retention tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.models import AmConfig, init_am_params
from kaldi_ctc_tpu.ops.rnn import RnnMode
from kaldi_ctc_tpu.training import TrainState, init_train_state
from kaldi_ctc_tpu.training.checkpoint import (
    apply_retention,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)

CFG = AmConfig(input_dim=6, num_targets=5, hidden_dim=8, num_layers=1,
               mode=RnnMode.LSTM, bidirectional=False)


def test_roundtrip(tmp_path):
    state = init_train_state(init_am_params(jax.random.PRNGKey(0), CFG))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state, extra={"epoch": 2})
    like = init_train_state(init_am_params(jax.random.PRNGKey(1), CFG))
    restored, meta = restore_checkpoint(d, like)
    assert meta["step"] == 7 and meta["extra"]["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_and_specific(tmp_path):
    state = init_train_state(init_am_params(jax.random.PRNGKey(0), CFG))
    d = str(tmp_path / "ckpt")
    assert latest_step(d) is None
    for s in (1, 5, 3):
        save_checkpoint(d, s, state)
    assert latest_step(d) == 5
    _, meta = restore_checkpoint(d, state, step=3)
    assert meta["step"] == 3


def test_retention(tmp_path):
    state = init_train_state(init_am_params(jax.random.PRNGKey(0), CFG))
    d = str(tmp_path / "ckpt")
    for s in range(0, 320, 20):
        save_checkpoint(d, s, state)
    removed = apply_retention(d, keep_every=100, keep_last=3)
    remaining = sorted(
        int(n.split("_")[1]) for n in __import__("os").listdir(d))
    # multiples of 100 plus last 3
    assert set(remaining) == {0, 100, 200, 300, 260, 280}
    assert 40 in removed


def test_inference_artifact_roundtrip(tmp_path):
    import jax
    import numpy as np
    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.models.artifact import (
        load_inference_artifact, save_inference_artifact)
    from kaldi_ctc_tpu.ops.rnn import RnnMode

    cfg = AmConfig(input_dim=6, num_targets=5, hidden_dim=8, num_layers=2,
                   mode=RnnMode.LSTM, bidirectional=True)
    params = init_am_params(jax.random.PRNGKey(1), cfg)
    priors = np.asarray([9, 1, 1, 1, 1], np.float32)
    path = str(tmp_path / "final.npz")
    save_inference_artifact(path, params, cfg, priors)
    p2, cfg2, pr2 = load_inference_artifact(path)
    assert cfg2 == cfg
    np.testing.assert_array_equal(pr2, priors)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(p2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
