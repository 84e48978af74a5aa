"""PLP + spectrogram feature computers (reference:
src/feat/feature-plp.{h,cc}, feature-spectrogram.{h,cc}).

Three layers of checks, mirroring the repo's fbank/MFCC strategy:
numpy-oracle parity for the sequential pieces (Durbin, LPC->cepstrum),
an independent whole-pipeline numpy PLP oracle, and the reference's own
stored HTK golden (test.wav.plp_htk.1, the feature-plp-test.cc:70-133
harness: +deltas, interior rows, |diff| <= 0.10)."""

import os

import numpy as np
import pytest

from kaldi_ctc_tpu.features import (
    FrameOptions,
    MelOptions,
    PlpOptions,
    SpectrogramOptions,
    add_deltas,
    compute_plp,
    compute_spectrogram,
    read_htk,
    read_wave,
)
from kaldi_ctc_tpu.features.plp import (
    durbin_lpc,
    equal_loudness_vector,
    idft_bases,
    lpc_to_cepstrum,
)

REF = "/root/reference/src/feat/test_data"


def np_durbin(ac, order):
    """Straight transliteration of Durbin (mel-computations.cc:269-300)
    for one frame — the oracle the batched lax.fori_loop must match."""
    lp = np.zeros(order)
    tmp = np.zeros(order)
    e = ac[0]
    for i in range(order):
        ki = ac[i + 1]
        for j in range(i):
            ki += lp[j] * ac[i - j]
        ki /= e
        c = max(1.0 - ki * ki, 1.0e-5)
        e *= c
        tmp[i] = -ki
        for j in range(i):
            tmp[j] = lp[j] - ki * lp[i - j - 1]
        lp[:i + 1] = tmp[:i + 1]
    return lp, e


def np_lpc2cep(lpc):
    n = len(lpc)
    cep = np.zeros(n)
    for i in range(n):
        s = 0.0
        for j in range(i):
            s += (i - j) * lpc[j] * cep[i - j - 1]
        cep[i] = -lpc[i] - s / (i + 1)
    return cep


def test_durbin_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    order = 12
    # autocorrelations of real random signals (positive-definite)
    acs = []
    for _ in range(7):
        x = rng.standard_normal(256)
        ac = np.correlate(x, x, "full")[255:255 + order + 1]
        acs.append(ac)
    acs = np.stack(acs)
    lp, e = durbin_lpc(np.asarray(acs, np.float32), order)
    lp, e = np.asarray(lp), np.asarray(e)
    for i in range(acs.shape[0]):
        lp_ref, e_ref = np_durbin(acs[i], order)
        np.testing.assert_allclose(lp[i], lp_ref, rtol=2e-4, atol=2e-4)
        assert abs(e[i] - e_ref) / e_ref < 1e-4


def test_lpc_to_cepstrum_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    lpc = rng.uniform(-0.5, 0.5, size=(5, 12))
    cep = np.asarray(lpc_to_cepstrum(np.asarray(lpc, np.float32)))
    for i in range(5):
        np.testing.assert_allclose(cep[i], np_lpc2cep(lpc[i]),
                                   rtol=1e-4, atol=1e-5)


def test_equal_loudness_curve_shape():
    """The curve must rise through the speech band and roll off exactly
    as E(f) = (f^2/(f^2+1.6e5))^2 * (f^2+1.44e6)/(f^2+9.61e6)."""
    opts = MelOptions(num_bins=23, low_freq=0.0)
    fo = FrameOptions()
    from kaldi_ctc_tpu.features.mel import mel_center_freqs
    f0 = mel_center_freqs(opts, fo).astype(np.float64)
    eql = equal_loudness_vector(opts, fo)
    fsq = f0 * f0
    expect = (fsq / (fsq + 1.6e5)) ** 2 * (fsq + 1.44e6) / (fsq + 9.61e6)
    np.testing.assert_allclose(eql, expect, rtol=1e-5)


def test_idft_bases_invert_cosine_expansion():
    """Feeding the bases a spectrum that is cos(k*pi*j/(M-1)) must
    return (up to the half-weight edge handling) a spike at lag k —
    the defining property of InitIdftBases."""
    m = idft_bases(13, 25)
    j = np.arange(25)
    for k in [0, 3, 7]:
        spec = np.cos(np.pi * k * j / 24.0)
        out = m @ spec
        # energy concentrates at lag k
        assert np.argmax(np.abs(out)) == k


def _np_plp(wave, opts: PlpOptions, ref_mod):
    """Independent numpy PLP oracle, built only from the repo's window/
    mel primitives + the transliterated Durbin above."""
    from kaldi_ctc_tpu.features.mel import mel_banks
    from kaldi_ctc_tpu.features.mfcc import lifter_coeffs
    from kaldi_ctc_tpu.features.window import (feature_window,
                                               frame_signal,
                                               padded_power_spectrum,
                                               process_frames)
    fo = opts.frame_opts
    frames = np.asarray(frame_signal(np.asarray(wave, np.float32), fo))
    frames, raw_e = process_frames(
        np.asarray(frames), fo, np.asarray(feature_window(fo)),
        need_raw_energy=True)
    frames = np.asarray(frames)
    power = np.asarray(padded_power_spectrum(np.asarray(frames), fo))
    mel = mel_banks(opts.mel_opts, fo)
    eql = equal_loudness_vector(opts.mel_opts, fo)
    feats = []
    for t in range(frames.shape[0]):
        me = mel @ power[t, :-1]
        me = np.maximum(me * eql, np.finfo(np.float32).tiny) ** \
            opts.compress_factor
        dup = np.concatenate([[me[0]], me, [me[-1]]])
        ac = idft_bases(opts.lpc_order + 1, len(dup)).astype(
            np.float64) @ dup
        lp, e = np_durbin(ac, opts.lpc_order)
        cep = np_lpc2cep(lp)
        row = np.concatenate([[np.log(max(e, 1e-38))],
                              cep[:opts.num_ceps - 1]])
        row *= lifter_coeffs(opts.cepstral_lifter, opts.num_ceps)
        if opts.use_energy:
            row[0] = np.asarray(raw_e)[t]
        feats.append(row)
    return np.stack(feats).astype(np.float32)


def test_plp_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)
    opts = PlpOptions(
        frame_opts=FrameOptions(dither=0.0),
        mel_opts=MelOptions(num_bins=23))
    ours = np.asarray(compute_plp(wave, opts))
    oracle = _np_plp(wave, opts, None)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference test_data not available")
def test_plp_htk_golden():
    """feature-plp-test.cc:70-133 (UnitTestHTKCompare1): PLP+deltas vs
    test.wav.plp_htk.1, |diff| <= 0.10 over interior rows."""
    htk, hdr = read_htk(os.path.join(REF, "test.wav.plp_htk.1"))
    samples, rate = read_wave(os.path.join(REF, "test.wav"))
    wave = samples[0]
    opts = PlpOptions(
        frame_opts=FrameOptions(dither=0.0, preemph_coeff=0.0,
                                window_type="hamming",
                                remove_dc_offset=False,
                                round_to_power_of_two=True),
        mel_opts=MelOptions(num_bins=23, low_freq=0.0),
        htk_compat=True, use_energy=False, cepstral_scale=1.0)
    raw = np.asarray(compute_plp(wave, opts))
    feats = np.asarray(add_deltas(raw, order=2, window=2))
    assert feats.shape == htk.shape
    diff = np.abs(feats[10:-10] - htk[10:-10])
    assert diff.max() <= 0.10, f"max diff {diff.max()} at " \
        f"{np.unravel_index(diff.argmax(), diff.shape)}"


def test_spectrogram_matches_numpy():
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(8000) * 100).astype(np.float32)
    fo = FrameOptions(dither=0.0)
    opts = SpectrogramOptions(frame_opts=fo)
    ours = np.asarray(compute_spectrogram(wave, opts))
    assert ours.shape[1] == opts.dim
    # naive oracle: hamming-family window via the repo primitives, rfft
    from kaldi_ctc_tpu.features.window import (feature_window,
                                               frame_signal,
                                               process_frames)
    frames = np.asarray(frame_signal(wave, fo))
    raw_e = np.log(np.maximum((frames ** 2).sum(axis=1),
                              np.finfo(np.float32).min))
    proc, _ = process_frames(np.asarray(frames), fo,
                             np.asarray(feature_window(fo)),
                             need_raw_energy=False)
    proc = np.asarray(proc)
    pad = np.zeros((proc.shape[0], fo.padded_window_size), np.float32)
    pad[:, :proc.shape[1]] = proc
    power = np.abs(np.fft.rfft(pad, axis=1)) ** 2
    expect = np.log(np.maximum(power, np.finfo(np.float32).eps))
    expect[:, 0] = raw_e
    np.testing.assert_allclose(ours, expect, rtol=1e-3, atol=1e-3)


def test_spectrogram_energy_floor_and_windowed_energy():
    rng = np.random.default_rng(4)
    wave = (rng.standard_normal(4000) * 10).astype(np.float32)
    fo = FrameOptions(dither=0.0)
    a = np.asarray(compute_spectrogram(
        wave, SpectrogramOptions(frame_opts=fo, raw_energy=False)))
    b = np.asarray(compute_spectrogram(
        wave, SpectrogramOptions(frame_opts=fo, raw_energy=True)))
    # windowed energy differs from raw energy (window attenuates)
    assert not np.allclose(a[:, 0], b[:, 0])
    hi = np.asarray(compute_spectrogram(
        wave, SpectrogramOptions(frame_opts=fo, energy_floor=1e6)))
    assert np.all(hi[:, 0] >= np.log(1e6) - 1e-4)


def test_compute_feats_cli_plp_and_spectrogram(tmp_path):
    import struct
    import wave as wave_mod

    from kaldi_ctc_tpu.cli import compute_feats
    from kaldi_ctc_tpu.utils.kaldi_io import SequentialMatrixReader

    rng = np.random.default_rng(5)
    pcm = (rng.standard_normal(16000) * 3000).astype(np.int16)
    wav_path = tmp_path / "a.wav"
    with wave_mod.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack(f"<{len(pcm)}h", *pcm))
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt1 {wav_path}\n")
    for ftype, dim in [("plp", 13), ("spectrogram", 257)]:
        out = tmp_path / f"{ftype}.ark"
        compute_feats.main([
            "--wav-scp", str(scp), "--type", ftype,
            "--out", f"ark:{out}", "--compress", "0"])
        mats = dict(SequentialMatrixReader(f"ark:{out}"))
        assert mats["utt1"].shape[1] == dim
        assert np.isfinite(mats["utt1"]).all()
