"""Trainer-integrated realignment (train_ctc --realign-epochs): the
align→relabel→adjust-priors loop of steps/ctc/train.sh:111-115.

Library level: realign_examples reproduces feasible label sequences
exactly (a valid Viterbi CTC path collapses back to its labels), drops
infeasible utterances, and counts true frame occupancies.  CLI level:
a tiny run with --realign-epochs reaches the same accuracy as the
baseline and leaves data-driven priors behind.
"""

import json
import os

import numpy as np
import pytest

from test_cli_e2e import _make_dataset, NUM_TARGETS, D


def _tiny_cfg():
    from kaldi_ctc_tpu.models import AmConfig
    return AmConfig(input_dim=D, num_targets=NUM_TARGETS,
                    hidden_dim=16, num_layers=1)


def test_realign_examples_relabels_and_counts():
    import jax

    from kaldi_ctc_tpu.data.egs import CtcExample
    from kaldi_ctc_tpu.models import init_am_params
    from kaldi_ctc_tpu.training.realign import realign_examples

    cfg = _tiny_cfg()
    params = init_am_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    exs = []
    for i in range(6):
        t = int(rng.integers(20, 40))
        labs = rng.integers(1, NUM_TARGETS, size=int(rng.integers(2, 6)))
        exs.append(CtcExample(
            f"u{i}", rng.standard_normal((t, D)).astype(np.float32),
            labs.astype(np.int32)))
    # one infeasible utterance: more labels than frames can carry
    exs.append(CtcExample(
        "bad", rng.standard_normal((3, D)).astype(np.float32),
        np.asarray([1, 1, 1, 1, 1], np.int32)))  # needs 2*5+... > 3

    kept, counts, stats = realign_examples(exs, params, cfg)
    assert stats["dropped"] == 1 and "bad" in stats["dropped_keys"]
    assert len(kept) == 6
    by_key = {e.key: e for e in exs}
    for e in kept:
        # relabel must reproduce the feasible sequences exactly
        np.testing.assert_array_equal(e.labels, by_key[e.key].labels)
        # raw-rate feats preserved (not the subsampled copies)
        assert e.feats.shape == by_key[e.key].feats.shape
    # counts cover every aligned frame, blank included
    total = sum(by_key[e.key].feats.shape[0] for e in kept)
    assert counts.sum() == total
    assert counts[0] > 0  # blanks occupy the non-spike frames
    # non-blank occupancies ≥ one frame per label instance
    n_labels = sum(len(e.labels) for e in kept)
    assert counts[1:].sum() >= n_labels


def test_parse_realign_epochs():
    from kaldi_ctc_tpu.training.realign import parse_realign_epochs
    assert parse_realign_epochs("") == frozenset()
    assert parse_realign_epochs("2,4") == frozenset({2, 4})
    assert parse_realign_epochs("3") == frozenset({3})


@pytest.mark.slow
def test_cli_train_with_realign(tmp_path):
    import contextlib
    import io

    from kaldi_ctc_tpu.cli import compute_prob, train_ctc

    fark, aark, _ = _make_dataset(tmp_path)
    exp = str(tmp_path / "exp_realign")
    train_ctc.main([
        "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--num-targets", str(NUM_TARGETS),
        "--hidden-dim", "24", "--num-layers", "2",
        "--epochs", "300", "--minibatch-size", "16",
        "--initial-learning-rate", "3e-2", "--final-learning-rate", "3e-3",
        "--momentum", "0.9", "--realign-epochs", "100,200",
        "--dir", exp, "--checkpoint-period", "100",
    ])
    # data-driven priors written by the realign pass
    priors = np.load(os.path.join(exp, "priors.npy"))
    assert priors.shape == (NUM_TARGETS,)
    assert abs(float(priors.sum()) - 1.0) < 1e-4   # occupancy estimate
    assert priors[0] > 0.05                        # blanks occupy frames
    # realign events recorded with zero dropped utterances
    events = [json.loads(l) for l in
              open(os.path.join(exp, "metrics.jsonl"))]
    re_ev = [e for e in events if e.get("event") == "realign"]
    assert len(re_ev) == 2
    assert all(e["dropped"] == 0 for e in re_ev)
    assert all(e["aligned"] == 16 for e in re_ev)

    # realigned model trains to the same accuracy as the baseline e2e run
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        compute_prob.main([
            "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
            "--dir", exp, "--minibatch-size", "8",
        ])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["accuracy"] > 0.95, out
