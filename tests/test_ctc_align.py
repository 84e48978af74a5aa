"""CTC forced alignment (Viterbi over the blank-interleaved lattice).

Brute-force parity: enumerate every valid CTC path on tiny cases and
check the op returns the argmax path and its score.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.ops.ctc import ctc_loss, ctc_viterbi_align, greedy_collapse


def _brute_force_best(logp, labels):
    """All frame-label sequences that collapse to `labels`; return the
    best (score, path)."""
    t, a = logp.shape
    best = (-np.inf, None)
    for path in itertools.product(range(a), repeat=t):
        # collapse: drop repeats then blanks (blank = 0)
        out = []
        prev = -1
        for x in path:
            if x != prev and x != 0:
                out.append(x)
            prev = x
        if out != list(labels):
            continue
        score = sum(logp[i, p] for i, p in enumerate(path))
        if score > best[0]:
            best = (score, path)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    t, a = 5, 3
    labels_np = rng.integers(1, a, size=rng.integers(1, 3))
    logits = jnp.asarray(rng.standard_normal((1, t, a)).astype(np.float32))
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]
    score_ref, path_ref = _brute_force_best(logp, labels_np)

    lmax = 4
    labels = jnp.zeros((1, lmax), jnp.int32).at[0, :len(labels_np)].set(
        jnp.asarray(labels_np, jnp.int32))
    frame_labels, lp, ok = ctc_viterbi_align(
        logits, labels, jnp.asarray([t]), jnp.asarray([len(labels_np)]))
    assert bool(ok[0])
    np.testing.assert_allclose(float(lp[0]), score_ref, rtol=1e-5)
    assert list(np.asarray(frame_labels)[0]) == list(path_ref)


def test_batch_collapse_and_masking():
    """Batched: each aligned path collapses back to its label sequence;
    pad frames are blank; path score <= total log-likelihood."""
    rng = np.random.default_rng(3)
    b, t, a, lmax = 6, 20, 5, 6
    lens = jnp.asarray(rng.integers(10, t + 1, b).astype(np.int32))
    label_lens = jnp.asarray(rng.integers(1, 5, b).astype(np.int32))
    labels_np = np.zeros((b, lmax), np.int32)
    for i in range(b):
        labels_np[i, :label_lens[i]] = rng.integers(1, a, int(label_lens[i]))
    labels = jnp.asarray(labels_np)
    logits = jnp.asarray(rng.standard_normal((b, t, a)).astype(np.float32))

    frame_labels, lp, ok = ctc_viterbi_align(logits, labels, lens,
                                             label_lens)
    assert bool(jnp.all(ok))
    collapsed, clens = greedy_collapse(frame_labels, lens)
    for i in range(b):
        assert int(clens[i]) == int(label_lens[i])
        np.testing.assert_array_equal(
            np.asarray(collapsed)[i, :int(clens[i])],
            labels_np[i, :int(label_lens[i])])
        # pad frames blank
        assert np.all(np.asarray(frame_labels)[i, int(lens[i]):] == 0)
    # Viterbi path probability can't exceed the full likelihood
    total = -ctc_loss(logits, labels, lens, label_lens)
    assert bool(jnp.all(lp <= total + 1e-4))


def test_infeasible_flagged():
    """Repeated labels need interleaved blanks: [1,1,1] in 3 frames has
    no valid path (min is 5) → infeasible, blank output."""
    logits = jnp.zeros((1, 3, 4), jnp.float32)
    labels = jnp.asarray([[1, 1, 1]], jnp.int32)
    frame_labels, _, ok = ctc_viterbi_align(
        logits, labels, jnp.asarray([3]), jnp.asarray([3]))
    assert not bool(ok[0])
    assert np.all(np.asarray(frame_labels) == 0)

    # distinct labels in exactly L frames ARE feasible (no 2L+1 needed)
    labels = jnp.asarray([[1, 2, 3]], jnp.int32)
    frame_labels, _, ok = ctc_viterbi_align(
        logits, labels, jnp.asarray([3]), jnp.asarray([3]))
    assert bool(ok[0])
    assert list(np.asarray(frame_labels)[0]) == [1, 2, 3]
