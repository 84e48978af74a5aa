"""Data pipeline tests: egs rules, bucketing, pipeline end-to-end."""

import numpy as np
import pytest

from kaldi_ctc_tpu.data import (
    CtcExample,
    EgsPipeline,
    Prefetcher,
    batch_by_length,
    bucket_length,
    collapse_alignment,
    example_ok,
    frame_subsample,
    load_examples,
    make_buckets,
    pad_batch,
)
from kaldi_ctc_tpu.utils import kaldi_io


def test_collapse_alignment():
    ali = np.asarray([3, 3, 3, 5, 5, 0, 0, 3], dtype=np.int32)
    out = collapse_alignment(ali)
    np.testing.assert_array_equal(out, [4, 6, 1, 4])  # +1 shift, uniqued
    assert collapse_alignment(np.asarray([], dtype=np.int32)).size == 0


def test_frame_subsample():
    feats = np.arange(10, dtype=np.float32)[:, None]
    np.testing.assert_array_equal(
        frame_subsample(feats, 3, 0)[:, 0], [0, 3, 6, 9])
    np.testing.assert_array_equal(
        frame_subsample(feats, 3, 1)[:, 0], [1, 4, 7])
    np.testing.assert_array_equal(
        frame_subsample(feats, 3, 2)[:, 0], [2, 5, 8])
    np.testing.assert_array_equal(frame_subsample(feats, 1, 0), feats)


def test_example_ok_rules():
    def eg(t, l):
        return CtcExample("u", np.zeros((t, 4), np.float32),
                          np.ones(l, np.int32))
    assert example_ok(eg(100, 10))
    assert not example_ok(eg(100, 50))        # t < 2l+1
    assert not example_ok(eg(3000, 10))       # too long
    assert not example_ok(eg(100, 0))         # empty labels
    assert not example_ok(eg(2000, 700))      # labels > 639
    assert example_ok(eg(21, 10))             # 2*10+1 = 21 exactly


def test_buckets():
    b = make_buckets(32, 2048, 1.25)
    assert b[0] == 32 and b[-1] == 2048
    assert bucket_length(33, b) == 40
    assert bucket_length(32, b) == 32
    # beyond the menu: exact pad (never an undersized allocation)
    assert bucket_length(99999, b) == 99999


def test_pad_batch_edge_replication():
    egs = [
        CtcExample("a", np.ones((5, 3), np.float32) * 2, np.asarray([1, 2], np.int32)),
        CtcExample("b", np.ones((9, 3), np.float32) * 7, np.asarray([3], np.int32)),
    ]
    out = pad_batch(egs, frame_buckets=[16], label_buckets=[4])
    assert out["feats"].shape == (2, 16, 3)
    assert out["labels"].shape == (2, 4)
    np.testing.assert_array_equal(out["input_lens"], [5, 9])
    np.testing.assert_array_equal(out["label_lens"], [2, 1])
    # pad region replicates the final frame, not zeros
    np.testing.assert_array_equal(out["feats"][0, 5:], 2.0)
    np.testing.assert_array_equal(out["feats"][1, 9:], 7.0)
    assert out["keys"] == ["a", "b"]


def test_batch_by_length_homogeneous():
    rng = np.random.default_rng(0)
    egs = [CtcExample(f"u{i}", np.zeros((int(rng.integers(10, 200)), 4),
                                        np.float32),
                      np.ones(3, np.int32))
           for i in range(64)]
    batches = list(batch_by_length(egs, minibatch_size=8))
    assert len(batches) == 8
    for b in batches:
        # all egs in a batch fit its bucket; spread is bounded by sorting
        assert b["feats"].shape[0] == 8
        assert b["feats"].shape[1] >= b["input_lens"].max()


def test_pipeline_epoch_and_shift_cycling(tmp_path):
    rng = np.random.default_rng(1)
    egs = [CtcExample(f"u{i}", rng.standard_normal((60, 4)).astype(np.float32),
                      np.asarray([1, 2, 3], np.int32))
           for i in range(16)]
    pipe = EgsPipeline(egs, minibatch_size=4, frame_subsampling_factor=3,
                       seed=7)
    b0 = list(pipe.epoch(0))
    b1 = list(pipe.epoch(1))
    assert len(b0) == 4 and len(b1) == 4
    # subsampled from 60 frames: shift 0 → 20 frames, shift 1 → 20
    assert all(int(b["input_lens"][0]) == 20 for b in b0)
    # epochs differ (different shift → different features)
    assert not np.allclose(b0[0]["feats"].sum(), b1[0]["feats"].sum())


def test_pipeline_skips_bad_examples():
    egs = [
        CtcExample("good", np.zeros((50, 4), np.float32),
                   np.asarray([1, 2], np.int32)),
        CtcExample("short", np.zeros((4, 4), np.float32),
                   np.asarray([1, 2, 3], np.int32)),  # t < 2l+1
    ] * 4
    pipe = EgsPipeline(egs, minibatch_size=4)
    batches = list(pipe.epoch(0))
    assert pipe.num_skipped == 4
    assert sum(b["feats"].shape[0] for b in batches) == 4


def test_load_examples_from_kaldi_files(tmp_path):
    rng = np.random.default_rng(2)
    feats = {f"utt{i}": rng.standard_normal((30 + i, 8)).astype(np.float32)
             for i in range(3)}
    alis = {f"utt{i}": np.asarray([2, 2, 5, 5, 5, 1], np.int32)
            for i in range(3)}
    fark, aark = tmp_path / "f.ark", tmp_path / "a.ark"
    with kaldi_io.MatrixWriter(f"ark:{fark}") as w:
        for k, v in feats.items():
            w[k] = v
    with kaldi_io.IntVectorWriter(f"ark:{aark}") as w:
        for k, v in alis.items():
            w[k] = v
    egs = list(load_examples(f"ark:{fark}", f"ark:{aark}"))
    assert len(egs) == 3
    np.testing.assert_array_equal(egs[0].labels, [3, 6, 2])  # collapsed +1
    np.testing.assert_array_equal(egs[1].feats, feats["utt1"])


def test_load_examples_with_cmvn(tmp_path):
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((40, 4)).astype(np.float32) * 3 + 5
    from kaldi_ctc_tpu.features.cmvn import acc_cmvn_stats
    stats = acc_cmvn_stats(feats)
    fark, aark, cark = (tmp_path / n for n in ("f.ark", "a.ark", "c.ark"))
    cscp = tmp_path / "c.scp"
    with kaldi_io.MatrixWriter(f"ark:{fark}") as w:
        w["u1"] = feats
    with kaldi_io.IntVectorWriter(f"ark:{aark}") as w:
        w["u1"] = np.asarray([1, 2], np.int32)
    with kaldi_io.MatrixWriter(f"ark,scp:{cark},{cscp}") as w:
        w["spkA"] = stats
    egs = list(load_examples(f"ark:{fark}", f"ark:{aark}",
                             cmvn_rspecifier=f"scp:{cscp}",
                             utt2spk={"u1": "spkA"}))
    assert len(egs) == 1
    np.testing.assert_allclose(egs[0].feats.mean(axis=0), 0.0, atol=1e-3)


def test_prefetcher():
    out = list(Prefetcher(iter(range(10))))
    assert out == list(range(10))

    def bad():
        yield 1
        raise ValueError("boom")

    p = Prefetcher(bad())
    assert next(p) == 1
    with pytest.raises(ValueError):
        list(p)


def test_perturb_examples():
    from kaldi_ctc_tpu.data.egs import perturb_examples
    rng = np.random.default_rng(7)
    # correlated features: dim1 = dim0 + small noise
    base = rng.standard_normal((200, 1)).astype(np.float32)
    feats = np.concatenate([base, base + 0.01 * rng.standard_normal(
        (200, 1)).astype(np.float32)], axis=1)
    egs = [CtcExample("u", feats, np.asarray([1], np.int32))]
    out = perturb_examples(egs, noise_scale=0.5, seed=0)
    delta = out[0].feats - feats
    assert np.abs(delta).max() > 0
    # noise follows the data covariance: the two dims stay correlated
    corr = np.corrcoef(delta[:, 0], delta[:, 1])[0, 1]
    assert corr > 0.9, corr
    # labels unchanged
    np.testing.assert_array_equal(out[0].labels, egs[0].labels)


def test_expand_config_args(tmp_path):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    cfg = tmp_path / "opts.conf"
    cfg.write_text("--hidden-dim=64  # comment\n\n--momentum 0.5\n")
    out = expand_config_args(
        ["--feats", "x", "--config", str(cfg), "--hidden-dim", "32"])
    # config tokens first, explicit flags later (override in argparse)
    assert out == ["--hidden-dim=64", "--momentum", "0.5",
                   "--feats", "x", "--hidden-dim", "32"]
    out2 = expand_config_args([f"--config={cfg}"])
    assert out2 == ["--hidden-dim=64", "--momentum", "0.5"]


def test_pipeline_fixed_shape():
    from kaldi_ctc_tpu.data.pipeline import EgsPipeline
    rng = np.random.default_rng(0)
    egs = []
    for i in range(8):
        t = 16 + 4 * (i % 3)
        egs.append(CtcExample(
            f"u{i}", rng.standard_normal((t, 4)).astype(np.float32),
            np.asarray([1, 2], np.int32)))
    pipe = EgsPipeline(egs, minibatch_size=4, fixed_shape=(32, 5))
    shapes = {b["feats"].shape for b in pipe.epoch(0)}
    assert shapes == {(4, 32, 4)}
    label_shapes = {b["labels"].shape for b in pipe.epoch(0)}
    assert label_shapes == {(4, 5)}


def test_batch_by_length_carries_window_remainders():
    """Window remainders roll into the next window: only the final
    < minibatch tail of the epoch is dropped (regression: each window
    silently dropped its longest examples)."""
    egs = [CtcExample(f"u{i}", np.zeros((10 + i, 4), np.float32),
                      np.ones(2, np.int32))
           for i in range(26)]
    batches = list(batch_by_length(egs, minibatch_size=4, sort_window=10))
    seen = {k for b in batches for k in b["keys"]}
    assert len(batches) == 6               # 24 of 26 batched
    assert len(seen) == 24
    # the two dropped are a tail, not two-per-window
    assert sum(1 for i in range(26) if f"u{i}" not in seen) == 2


def test_pad_batch_beyond_bucket_menu():
    egs = [CtcExample("long", np.ones((100, 3), np.float32),
                      np.asarray([1], np.int32))]
    out = pad_batch(egs, frame_buckets=[16, 32], label_buckets=[4])
    assert out["feats"].shape == (1, 100, 3)   # exact pad, no crash


def test_expand_config_args_with_subcommand(tmp_path):
    """Config tokens insert after leading positionals so subparser CLIs
    accept --config (regression: they were prepended before the
    subcommand and argparse rejected them)."""
    from kaldi_ctc_tpu.utils.options import expand_config_args
    cfg = tmp_path / "o.conf"
    cfg.write_text("--acoustic-scale=0.1\n")
    out = expand_config_args(
        ["scale", "--config", str(cfg), "--lattices", "x"])
    assert out == ["scale", "--acoustic-scale=0.1", "--lattices", "x"]
