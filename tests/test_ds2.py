"""DS2 model family: conv front end over (time, freq) before the RNN
stack.

The reference declares the DS2 model type but asserts on it
(make_configs.py:121-122 offers google|DS2|FT; :294 "Not sppourt DS2,
now.") — this framework implements it: Deep Speech 2 2D convolutions
(kernels (11,41)/(11,21)/(11,21), freq stride 2, first-layer time
stride) with clipped ReLU, flattened into the recurrent stack.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.models import AmConfig, am_forward, init_am_params
from kaldi_ctc_tpu.ops.rnn import RnnMode


def _cfg(**kw):
    base = dict(input_dim=8, num_targets=6, hidden_dim=16, num_layers=1,
                mode=RnnMode.GRU, bidirectional=False,
                conv_layers=2, conv_channels=4, conv_time_stride=2)
    base.update(kw)
    return AmConfig(**base)


def test_config_math_and_roundtrip():
    cfg = _cfg()
    assert cfg.time_stride == 2
    # freq 8 -> 4 -> 2, channels 4 -> rnn input 8
    assert cfg.conv_out_dim == 2 * 4
    assert cfg.rnn.input_dim == 8
    lens = np.asarray([1, 2, 3, 10, 11], np.int32)
    np.testing.assert_array_equal(cfg.output_lens(lens), [1, 1, 2, 5, 6])
    # json round trip keeps the conv fields
    cfg2 = AmConfig.from_dict(cfg.to_dict())
    assert cfg2 == cfg
    # configs saved before the DS2 fields existed still load
    d = cfg.to_dict()
    for k in ("conv_layers", "conv_channels", "conv_time_stride"):
        d.pop(k)
    assert AmConfig.from_dict(d).conv_layers == 0


def test_seq_norm_moments_and_masking():
    """conv_norm='seq' (DS2 §3.2 sequence-wise batch norm, functional):
    with unit gamma / zero beta, the pre-activation map after the first
    conv layer has ~zero mean and ~unit variance per (utterance,
    channel) over the VALID frames — and pad frames beyond each
    utterance's length do not shift the moments."""
    cfg = _cfg(conv_layers=1)
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    assert "norm_g" in params["conv"][0]          # seq is the default
    rng = np.random.default_rng(3)
    b, t = 2, 24
    feats = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
    lens = jnp.asarray([24, 15], np.int32)

    # tap the normalized map by running the conv stage manually through
    # am_forward's own code path: compare logits of a padded copy whose
    # pad region is filled with huge values — identical valid logits
    # proves the moments exclude pad frames entirely
    base = np.asarray(am_forward(params, jnp.asarray(feats), cfg, lens))
    poisoned = feats.copy()
    poisoned[1, 15:] = 50.0                        # junk past len=15
    got = np.asarray(am_forward(params, jnp.asarray(poisoned), cfg, lens))
    out_l = -(-15 // cfg.time_stride)
    np.testing.assert_allclose(got[1, :out_l], base[1, :out_l],
                               rtol=1e-4, atol=1e-4)

    # conv_norm="none" reproduces the unnormalized front (no extra params)
    cfg_n = _cfg(conv_layers=1, conv_norm="none")
    p_n = init_am_params(jax.random.PRNGKey(0), cfg_n)
    assert "norm_g" not in p_n["conv"][0]
    am_forward(p_n, jnp.asarray(feats), cfg_n, lens)  # still runs


def test_ds2_rejects_splice_and_front():
    with pytest.raises(ValueError):
        _cfg(splice_left=2).rnn
    with pytest.raises(ValueError):
        _cfg(front_affine_dim=8).rnn


def test_forward_shapes_and_pad_invariance():
    cfg = _cfg()
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 3, 21
    feats = rng.standard_normal((b, t, cfg.input_dim)).astype(np.float32)
    lens = np.asarray([21, 13, 7], np.int32)
    logits = np.asarray(am_forward(params, jnp.asarray(feats), cfg,
                                   jnp.asarray(lens)))
    assert logits.shape == (b, -(-t // 2), cfg.num_targets)
    # more padding must not change the valid logit rows (conv pad
    # masking + RNN length masking)
    pad = np.concatenate([feats, np.full((b, 11, cfg.input_dim), 7.0,
                                         np.float32)], axis=1)
    logits2 = np.asarray(am_forward(params, jnp.asarray(pad), cfg,
                                    jnp.asarray(lens)))
    for j, l in enumerate(lens):
        out_l = -(-int(l) // 2)
        # tolerance: the seq-norm moments are reductions whose XLA tree
        # shape depends on the padded T, so the same valid addends round
        # differently (~1e-6 relative, amplified through the stack);
        # semantic pad invariance is what this asserts
        np.testing.assert_allclose(logits2[j, :out_l], logits[j, :out_l],
                                   rtol=2e-4, atol=5e-4)


def test_ds2_overfits_tiny_task():
    from kaldi_ctc_tpu.data.egs import CtcExample
    from kaldi_ctc_tpu.data.bucketing import pad_batch
    from kaldi_ctc_tpu.training import (TrainOptions, init_train_state,
                                        make_train_step)

    cfg = _cfg(hidden_dim=24, conv_channels=8)
    rng = np.random.default_rng(1)
    egs = []
    for i in range(8):
        # distinct adjacent labels: a repeated label needs a precisely
        # placed blank gap after 2x downsampling, which greedy argmax
        # does not guarantee even at low loss
        labels = rng.permutation(np.arange(1, cfg.num_targets))[:2]
        labels = labels.astype(np.int32)
        t = 40
        feats = 0.1 * rng.standard_normal((t, cfg.input_dim))
        # paint each label onto a channel over a sustained span, with a
        # gap between spans
        for k, lab in enumerate(labels):
            feats[k * 20:k * 20 + 16, lab] += 3.0
        egs.append(CtcExample(f"u{i}", feats.astype(np.float32), labels))
    batch = pad_batch(egs, [40], [2])
    batch.pop("keys")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    params = init_am_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params)
    opts = TrainOptions(initial_learning_rate=3e-2,
                        final_learning_rate=3e-3, num_steps=800,
                        momentum=0.9)
    step = make_train_step(cfg, opts)
    first = None
    for _ in range(800):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss_per_frame"])
    last = float(m["loss_per_frame"])
    assert last < 0.1 * first, (first, last)

    # greedy decode on the trained model recovers the labels for most
    # utterances (exact greedy argmax on 20-frame outputs is peaky —
    # a sequence or two can lose a label at very low loss)
    logits = am_forward(state.params, batch["feats"], cfg,
                        batch["input_lens"])
    out_lens = np.asarray(cfg.output_lens(batch["input_lens"]))
    ids = np.asarray(jnp.argmax(logits, axis=-1))
    n_exact = 0
    for j, e in enumerate(egs):
        seq, prev = [], -1
        for x in ids[j, :out_lens[j]]:
            if x != prev and x != 0:
                seq.append(int(x))
            prev = x
        n_exact += seq == list(e.labels)
    assert n_exact >= 6, n_exact
