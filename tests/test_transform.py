"""transform-feats + egs feature pipeline (deltas/splice/LDA/fMLLR) and
extract-segments support in compute_feats."""

import wave as wavemod

import numpy as np
import pytest

from kaldi_ctc_tpu.features.transform import apply_transform
from kaldi_ctc_tpu.utils import kaldi_io


def test_apply_transform_linear_and_affine():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((7, 4)).astype(np.float32)
    lin = rng.standard_normal((3, 4)).astype(np.float32)
    np.testing.assert_allclose(apply_transform(feats, lin), feats @ lin.T,
                               rtol=1e-6)
    aff = rng.standard_normal((3, 5)).astype(np.float32)
    np.testing.assert_allclose(apply_transform(feats, aff),
                               feats @ aff[:, :4].T + aff[:, 4],
                               rtol=1e-5)
    with pytest.raises(ValueError):
        apply_transform(feats, rng.standard_normal((3, 7)))


def test_prepare_egs_feature_pipeline(tmp_path):
    """--add-deltas / --splice / --transform / --transforms in
    get_egs2.sh order, verified against a manual reimplementation."""
    from kaldi_ctc_tpu.cli import prepare_egs
    from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
    from kaldi_ctc_tpu.features.functions import add_deltas, splice_frames

    rng = np.random.default_rng(1)
    fark, aark = tmp_path / "feats.ark", tmp_path / "ali.ark"
    raw = {}
    with kaldi_io.MatrixWriter(f"ark:{fark}") as fw, \
            kaldi_io.IntVectorWriter(f"ark:{aark}") as aw:
        for i in range(3):
            t = 24 + 4 * i
            raw[f"u{i}"] = rng.standard_normal((t, 4)).astype(np.float32)
            fw[f"u{i}"] = raw[f"u{i}"]
            aw[f"u{i}"] = np.array([1, 2, 3], np.int32)

    # splice ±2 (dim 20) then LDA to 6 dims
    lda = rng.standard_normal((6, 20)).astype(np.float32)
    lda_p = tmp_path / "lda.mat"
    kaldi_io.write_matrix(str(lda_p), lda)
    # per-speaker affine fMLLR on the 6-dim output; u0,u1 -> spkA
    fmllr = rng.standard_normal((6, 7)).astype(np.float32)
    with kaldi_io.MatrixWriter(f"ark:{tmp_path}/trans.ark") as tw:
        tw["spkA"] = fmllr
    (tmp_path / "utt2spk").write_text("u0 spkA\nu1 spkA\nu2 spkB\n")

    prepare_egs.main([
        "get", "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--splice-left", "2", "--splice-right", "2",
        "--transform", str(lda_p),
        "--transforms", f"ark:{tmp_path}/trans.ark",
        "--utt2spk", str(tmp_path / "utt2spk"),
        "--output", f"ark:{tmp_path}/egs.ark", "--compress", "0"])
    egs = {e.key: e for e in
           SequentialEgsReader(f"ark:{tmp_path}/egs.ark")}
    assert set(egs) == {"u0", "u1", "u2"}
    for key, eg in egs.items():
        want = np.asarray(splice_frames(raw[key], 2, 2)) @ lda.T
        if key in ("u0", "u1"):
            want = want @ fmllr[:, :6].T + fmllr[:, 6]
        np.testing.assert_allclose(eg.feats, want, rtol=1e-4, atol=1e-4)

    # raw route: deltas only
    prepare_egs.main([
        "get", "--feats", f"ark:{fark}", "--ali", f"ark:{aark}",
        "--add-deltas", "2",
        "--output", f"ark:{tmp_path}/egs_d.ark", "--compress", "0"])
    egs = {e.key: e for e in
           SequentialEgsReader(f"ark:{tmp_path}/egs_d.ark")}
    for key, eg in egs.items():
        np.testing.assert_allclose(
            eg.feats, np.asarray(add_deltas(raw[key], order=2)),
            rtol=1e-4, atol=1e-5)
        assert eg.feats.shape[1] == 12


def test_compute_feats_segments(tmp_path):
    from kaldi_ctc_tpu.cli import compute_feats

    rate = 16000
    t = np.arange(int(1.0 * rate))
    samples = (5000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    wav = tmp_path / "reco.wav"
    with wavemod.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    (tmp_path / "wav.scp").write_text(f"reco1 {wav}\n")
    (tmp_path / "segments").write_text(
        "utt_a reco1 0.00 0.40\n"
        "utt_b reco1 0.40 0.90\n"
        "utt_tail reco1 0.90 -1\n"
        "utt_tiny reco1 0.50 0.55\n"      # < min-segment-length
        "utt_gone reco2 0.0 1.0\n")       # missing recording: ignored
    out = tmp_path / "feats.ark"
    compute_feats.main([
        "--wav-scp", str(tmp_path / "wav.scp"),
        "--segments", str(tmp_path / "segments"),
        "--type", "fbank", "--out", f"ark:{out}", "--compress", "0"])
    feats = dict(kaldi_io.SequentialMatrixReader(f"ark:{out}"))
    assert set(feats) == {"utt_a", "utt_b", "utt_tail"}
    # 25ms/10ms framing: 0.4s -> 38 frames, 0.5s -> 48, 0.1s -> 8
    assert feats["utt_a"].shape[0] == 38
    assert feats["utt_b"].shape[0] == 48
    assert feats["utt_tail"].shape[0] == 8
