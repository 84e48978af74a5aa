"""Decoder tests: prefix beam search vs exhaustive search, greedy, scores."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.decoding import (
    acoustic_scores,
    greedy_decode,
    prefix_beam_search,
)


def exhaustive_best_labeling(log_probs, blank=0, max_t=None):
    """Ground truth: enumerate all paths, sum per labeling, take argmax."""
    t, a = log_probs.shape
    scores = {}
    for path in itertools.product(range(a), repeat=t):
        lab = []
        prev = -1
        for p in path:
            if p != prev and p != blank:
                lab.append(p)
            prev = p
        key = tuple(lab)
        lp = sum(log_probs[i, p] for i, p in enumerate(path))
        scores[key] = np.logaddexp(scores.get(key, -np.inf), lp)
    best = max(scores, key=scores.get)
    return list(best), scores[best]


def test_prefix_beam_vs_exhaustive():
    rng = np.random.default_rng(0)
    for trial in range(5):
        t, a = 6, 4
        logits = rng.standard_normal((t, a)) * 1.5
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits)))
        want_lab, want_score = exhaustive_best_labeling(lp)
        labels, lens, scores = prefix_beam_search(
            jnp.asarray(lp[None]), jnp.asarray([t]), beam=16, prune_k=3)
        got = list(np.asarray(labels)[0][: int(lens[0])])
        assert got == want_lab, (trial, got, want_lab)
        # beam score is a lower bound on the exhaustive labeling score
        # (pruned prefixes lose their mass), within a small gap
        assert want_score - 0.1 < float(scores[0]) < want_score + 1e-3


def test_prefix_beam_batch_and_lengths():
    rng = np.random.default_rng(1)
    b, t, a = 3, 10, 5
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((b, t, a)) * 2)))
    lens = np.asarray([10, 6, 3])
    labels, out_lens, scores = prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), beam=8, prune_k=4)
    # each matches the single-utterance decode truncated to its length
    for i in range(b):
        want_lab, _ = exhaustive_best_labeling(lp[i, : lens[i]])
        got = list(np.asarray(labels)[i][: int(out_lens[i])])
        assert got == want_lab, (i, got, want_lab)


def test_prefix_beam_beats_greedy_on_adversarial_case():
    # classic case where best-path argmax != best labeling:
    # p(blank)=0.4, p(1)=0.35, p(2)=0.25 at both frames → greedy says blank
    # (empty), but P(label "1") aggregated over paths can win.
    p = np.asarray([[0.4, 0.35, 0.25], [0.4, 0.35, 0.25]], dtype=np.float64)
    lp = np.log(p)
    want_lab, _ = exhaustive_best_labeling(lp)
    labels, lens, _ = prefix_beam_search(
        jnp.asarray(lp[None]), jnp.asarray([2]), beam=8, prune_k=2)
    got = list(np.asarray(labels)[0][: int(lens[0])])
    assert got == want_lab
    g_labels, g_lens = greedy_decode(jnp.asarray(lp[None]), jnp.asarray([2]))
    greedy = list(np.asarray(g_labels)[0][: int(g_lens[0])])
    # exhaustive best is [1]; greedy collapses to empty
    assert got == [1] and greedy == []


def test_greedy_decode():
    scores = jnp.asarray(np.log([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1],
                                 [0.1, 0.8, 0.1], [0.8, 0.1, 0.1],
                                 [0.1, 0.1, 0.8]])[None])
    labels, lens = greedy_decode(scores, jnp.asarray([5]))
    assert list(np.asarray(labels)[0][: int(lens[0])]) == [1, 2]


def test_acoustic_scores_blank_skip_and_priors():
    logits = jnp.asarray(np.asarray([
        [[10.0, 0.0, 0.0],    # blank-dominated frame → skipped
         [0.0, 5.0, 0.0]]]))  # normal frame
    priors = np.asarray([9.0, 1.0, 1.0], np.float32)
    scores, skip = acoustic_scores(logits, priors=priors,
                                   acoustic_scale=1.0, blank_threshold=0.98)
    skip = np.asarray(skip)
    assert skip[0, 0] and not skip[0, 1]
    s = np.asarray(scores)
    # skipped frame forced to pure blank
    assert s[0, 0, 0] == 0.0 and s[0, 0, 1] < -1e20
    # prior division: blank score reduced by log(9) on normal frames
    lp = np.asarray(jax.nn.log_softmax(logits))[0, 1]
    np.testing.assert_allclose(s[0, 1, 0], lp[0] - np.log(9.0), rtol=1e-5)
    np.testing.assert_allclose(s[0, 1, 1], lp[1], rtol=1e-5)


def test_acoustic_scale():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 3, 4)).astype(np.float32))
    s1, _ = acoustic_scores(logits, acoustic_scale=1.0, blank_threshold=1.0)
    s2, _ = acoustic_scores(logits, acoustic_scale=0.5, blank_threshold=1.0)
    np.testing.assert_allclose(np.asarray(s2), 0.5 * np.asarray(s1),
                               rtol=1e-5)
