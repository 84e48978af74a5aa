"""Resampler tests: tone preservation, length, speed perturbation."""

import numpy as np
import pytest

from kaldi_ctc_tpu.features.resample import resample, speed_perturb


def _tone(freq, rate, seconds=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _dominant_freq(x, rate):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * rate / len(x)


@pytest.mark.parametrize("src,dst", [(16000, 8000), (8000, 16000),
                                     (16000, 14400)])
def test_tone_preserved(src, dst):
    x = _tone(440.0, src)
    y = resample(x, src, dst)
    assert abs(len(y) - len(x) * dst / src) <= 2
    f = _dominant_freq(y, dst)
    assert abs(f - 440.0) < 5.0, f


def test_identity():
    x = _tone(100.0, 16000)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)


def test_amplitude_preserved():
    x = _tone(440.0, 16000)
    y = resample(x, 16000, 8000)
    # RMS of interior should match closely
    assert abs(np.std(y[100:-100]) - np.std(x[100:-100])) < 0.02


@pytest.mark.parametrize("factor", [0.9, 1.1])
def test_speed_perturb_changes_length_and_pitch(factor):
    rate = 16000
    x = _tone(440.0, rate)
    y = speed_perturb(x, rate, factor)
    assert abs(len(y) - len(x) / factor) <= 3
    # playing faster raises pitch by the same factor
    f = _dominant_freq(y, rate)
    assert abs(f - 440.0 * factor) < 8.0, f


def test_compute_feats_speed_perturb(tmp_path):
    """3-way perturbation through the CLI: 3x keys, sp-prefixed."""
    import io as _io
    import struct
    import wave as wavemod

    import numpy as np

    from kaldi_ctc_tpu.cli import compute_feats
    from kaldi_ctc_tpu.utils import kaldi_io

    # write a small 16 kHz wav
    rate = 16000
    t = np.arange(int(0.3 * rate))
    samples = (5000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    wav = tmp_path / "a.wav"
    with wavemod.open(str(wav), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(rate)
        w.writeframes(samples.tobytes())
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt1 {wav}\n")
    out = tmp_path / "feats.ark"
    compute_feats.main([
        "--wav-scp", str(scp), "--type", "fbank",
        "--out", f"ark:{out}", "--compress", "0",
        "--speed-perturb", "0.9,1.0,1.1",
    ])
    feats = dict(kaldi_io.SequentialMatrixReader(f"ark:{out}"))
    assert set(feats) == {"utt1", "sp0.9-utt1", "sp1.1-utt1"}
    # slower audio (factor 0.9) has more frames; faster has fewer
    assert feats["sp0.9-utt1"].shape[0] > feats["utt1"].shape[0]
    assert feats["sp1.1-utt1"].shape[0] < feats["utt1"].shape[0]


def test_upsampling_amplitude_and_dc_gain():
    """up>1 paths: amplitude preserved, DC gain exactly 1 (regression:
    the polyphase filters applied the zero-stuffing gain and cutoff to a
    direct-form gather, making up>1 outputs up-times too loud and
    lowpassed at 1/up of the band)."""
    from kaldi_ctc_tpu.features.resample import resample, speed_perturb
    rate = 16000
    t = np.arange(rate)
    tone = np.sin(2 * np.pi * 1000 * t / rate).astype(np.float32)
    for f in (0.9, 1.1):
        out = speed_perturb(tone, rate, f)
        rms = float(np.sqrt((out[200:-200] ** 2).mean()))
        assert abs(rms - 0.7071) < 0.01, (f, rms)
    const = np.ones(rate, np.float32)
    dc = float(speed_perturb(const, rate, 0.9)[500:1500].mean())
    assert abs(dc - 1.0) < 1e-3
    up = resample(np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
                  .astype(np.float32), 8000, 16000)
    rms = float(np.sqrt((up[200:-200] ** 2).mean()))
    assert abs(rms - 0.7071) < 0.01
