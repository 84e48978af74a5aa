"""Pallas CTC recursion kernels vs the lax.scan implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_ctc_tpu.ops.ctc import ctc_loss_and_grad


def _random_case(rng, b, t, a, lmax):
    logits = rng.standard_normal((b, t, a)).astype(np.float32) * 2
    label_lens = rng.integers(1, lmax + 1, size=b)
    labels = np.zeros((b, lmax), dtype=np.int32)
    for i in range(b):
        labels[i, : label_lens[i]] = rng.integers(1, a, size=label_lens[i])
    input_lens = rng.integers(2 * lmax + 1, t + 1, size=b)
    return (jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(input_lens.astype(np.int32)),
            jnp.asarray(label_lens.astype(np.int32)))


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    args = _random_case(rng, b=6, t=24, a=10, lmax=5)
    loss_x, grad_x = ctc_loss_and_grad(*args, implementation="xla")
    loss_p, grad_p = ctc_loss_and_grad(*args,
                                       implementation="pallas_interpret")
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_infeasible_and_short_utts():
    logits = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 9, 5)).astype(np.float32))
    labels = jnp.asarray([[1, 1, 1, 0], [2, 3, 0, 0], [4, 0, 0, 0]],
                         dtype=jnp.int32)
    input_lens = jnp.asarray([4, 9, 3])   # utt0 infeasible ([1,1,1] needs 5)
    label_lens = jnp.asarray([3, 2, 1])
    loss_x, grad_x = ctc_loss_and_grad(logits, labels, input_lens, label_lens,
                                       implementation="xla")
    loss_p, grad_p = ctc_loss_and_grad(logits, labels, input_lens, label_lens,
                                       implementation="pallas_interpret")
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x),
                               rtol=1e-4, atol=1e-5)
    assert float(loss_p[0]) == 0.0


def test_empty_label_batch_interpret():
    """All-empty transcripts give extended width S=1; the skip shift must
    not request a negative pltpu.roll (regression)."""
    import jax
    import jax.numpy as jnp
    from kaldi_ctc_tpu.ops.ctc import ctc_loss_and_grad

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 6, 5)).astype(np.float32))
    labels = jnp.zeros((2, 0), jnp.int32)
    input_lens = jnp.array([6, 4], jnp.int32)
    label_lens = jnp.zeros((2,), jnp.int32)
    loss_p, grad_p = ctc_loss_and_grad(
        logits, labels, input_lens, label_lens,
        implementation="pallas_interpret")
    loss_x, grad_x = ctc_loss_and_grad(
        logits, labels, input_lens, label_lens, implementation="xla")
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x),
                               rtol=1e-4, atol=1e-4)
