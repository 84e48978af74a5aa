"""Kaldi pitch tracker tests (feat/pitch-functions.cc parity properties:
correct f0 on periodic signals, POV behavior, processed-feature shape)."""

import numpy as np

from kaldi_ctc_tpu.features.pitch import (
    PitchOptions, ProcessPitchOptions, compute_and_process_pitch,
    compute_kaldi_pitch, process_pitch)


def tone(freq, dur=1.0, fs=16000, amp=0.5):
    t = np.arange(int(dur * fs)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestComputePitch:
    def test_pure_tone_pitch(self):
        for f0 in (100.0, 150.0, 220.0, 320.0):
            raw = compute_kaldi_pitch(tone(f0))
            assert raw.shape[1] == 2
            # interior frames: pitch within 2% of f0 (geometric lag grid
            # step is 0.5%)
            mid = raw[10:-10, 1]
            assert np.all(np.abs(mid - f0) / f0 < 0.02), (f0, mid[:5])
            # NCCF near 1 for a perfectly periodic signal
            assert np.median(raw[10:-10, 0]) > 0.9

    def test_pitch_change_tracked(self):
        # 240 -> 120: the track must switch down (staying at lag 1/240
        # scores NCCF -1 in the 120 Hz region).  NOTE the upward direction
        # (120 -> 240) legitimately stays at 120 for a *perfectly*
        # periodic synthetic: NCCF is exactly 1 at every multiple of the
        # period, so the continuity prior wins the tie — real speech
        # breaks such ties through envelope variation.
        # 170/230 share no common subharmonic above min_f0 (a constant
        # track at a common lag would otherwise fit both perfectly), and
        # ballast is disabled so local NCCF evidence isn't flattened.
        wave = np.concatenate([tone(170, 0.5), tone(230, 0.5)])
        raw = compute_kaldi_pitch(wave, PitchOptions(nccf_ballast=0.0))
        t = raw.shape[0]
        first = np.median(raw[5:t // 2 - 5, 1])
        second = np.median(raw[t // 2 + 5:-5, 1])
        assert abs(first - 170) < 8
        assert abs(second - 230) < 10

    def test_noise_has_low_nccf(self):
        rng = np.random.default_rng(0)
        wave = rng.standard_normal(16000).astype(np.float32) * 0.1
        raw = compute_kaldi_pitch(wave)
        # white noise: much weaker periodicity than a tone
        assert np.median(raw[:, 0]) < 0.6

    def test_quiet_frames_ballast(self):
        # silence (tiny noise) around a tone: ballast keeps NCCF-pitch
        # defined and pitch stays within the search range everywhere
        rng = np.random.default_rng(1)
        wave = np.concatenate([
            rng.standard_normal(4000).astype(np.float32) * 1e-4,
            tone(150, 0.5),
            rng.standard_normal(4000).astype(np.float32) * 1e-4])
        opts = PitchOptions()
        raw = compute_kaldi_pitch(wave, opts)
        assert np.all(raw[:, 1] >= opts.min_f0 - 1e-3)
        assert np.all(raw[:, 1] <= opts.max_f0 + 1e-3)
        assert np.all(np.isfinite(raw))

    def test_frame_count(self):
        opts = PitchOptions()
        raw = compute_kaldi_pitch(tone(150, 1.0), opts)
        # 4kHz downsample, 100-sample window, 40-sample shift:
        # 1 + (4000 - 100) // 40 = 98
        assert raw.shape[0] == 98

    def test_short_input(self):
        raw = compute_kaldi_pitch(tone(150, 0.01))
        assert raw.shape == (0, 2)


class TestProcessPitch:
    def test_default_three_dims(self):
        feats = compute_and_process_pitch(tone(150))
        assert feats.shape[1] == 3
        assert np.all(np.isfinite(feats))

    def test_normalized_log_pitch_zero_for_constant(self):
        feats = compute_and_process_pitch(tone(180))
        # constant pitch: normalized log pitch ~ 0
        assert np.abs(feats[10:-10, 1]).max() < 0.05

    def test_delta_pitch_signs(self):
        wave = np.concatenate([tone(170, 0.5), tone(230, 0.5)])
        opts = ProcessPitchOptions(delta_pitch_noise_stddev=0.0)
        raw = compute_kaldi_pitch(wave, PitchOptions(nccf_ballast=0.0))
        feats = process_pitch(raw, opts)
        t = feats.shape[0]
        # delta-pitch spikes positive at the 120->240 transition
        assert feats[:, 2].max() > 0.1
        assert np.argmax(feats[:, 2]) in range(t // 2 - 5, t // 2 + 6)

    def test_raw_log_pitch_column(self):
        opts = ProcessPitchOptions(add_raw_log_pitch=True)
        raw = compute_kaldi_pitch(tone(200))
        feats = process_pitch(raw, opts)
        assert feats.shape[1] == 4
        np.testing.assert_allclose(feats[10:-10, 3], np.log(200), rtol=0.03)

    def test_pov_feature_monotone_in_nccf(self):
        raw = np.stack([np.linspace(-1, 1, 50),
                        np.full(50, 100.0)], axis=1)
        feats = process_pitch(raw, ProcessPitchOptions(
            delta_pitch_noise_stddev=0.0))
        pov = feats[:, 0]
        assert np.all(np.diff(pov) < 0)  # (1.0001 - n)^0.15 - 1 decreases
