"""Feature extraction driver (compute-mfcc-feats / compute-fbank-feats).

Reads wav.scp (path or `cmd ... |` pipe entries are NOT yet supported —
plain paths only), computes MFCC or fbank on device, writes a Kaldi
feature archive (+scp), optionally compressed like the reference recipes.
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-scp", required=True)
    p.add_argument("--type", choices=["mfcc", "fbank", "pitch"],
                   default="mfcc",
                   help="pitch = compute-kaldi-pitch-feats | "
                        "process-kaldi-pitch-feats (3-dim)")
    p.add_argument("--add-pitch", type=int, default=0,
                   help="append 3-dim processed pitch to mfcc/fbank "
                        "(paste-feats analogue; rows matched by "
                        "truncation to the shorter stream)")
    p.add_argument("--config", choices=["default", "hires"], default="default")
    p.add_argument("--num-mel-bins", type=int, default=None)
    p.add_argument("--num-ceps", type=int, default=None)
    p.add_argument("--dither", type=float, default=0.0,
                   help="dither amount (deterministic seed per utterance)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True,
                   help="output like ark,scp:feats.ark,feats.scp")
    p.add_argument("--compress", type=int, default=1)
    p.add_argument("--speed-perturb", default=None,
                   help="comma list of speed factors, e.g. 0.9,1.0,1.1 "
                        "(the recipe's 3-way perturbation, "
                        "run_ctc_phone.sh stage 0); perturbed copies get "
                        "Kaldi-style 'spFACTOR-' key prefixes")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from kaldi_ctc_tpu.features import (
        FbankOptions, FrameOptions, MfccOptions, compute_fbank, compute_mfcc,
        read_wave)
    from kaldi_ctc_tpu.features.mel import MelOptions
    from kaldi_ctc_tpu.utils import get_logger
    from kaldi_ctc_tpu.utils.kaldi_io import MatrixWriter, SequentialTextReader

    args = parse_args(argv)
    log = get_logger("compute_feats")
    frame_opts = FrameOptions(dither=args.dither)

    from kaldi_ctc_tpu.features.pitch import compute_and_process_pitch

    if args.type == "pitch":
        opts = None
        compute = None
    elif args.type == "mfcc":
        opts = MfccOptions.hires() if args.config == "hires" else MfccOptions()
        if args.num_mel_bins or args.num_ceps:
            opts = MfccOptions(
                frame_opts=frame_opts,
                mel_opts=MelOptions(
                    num_bins=args.num_mel_bins or opts.mel_opts.num_bins,
                    low_freq=opts.mel_opts.low_freq,
                    high_freq=opts.mel_opts.high_freq),
                num_ceps=args.num_ceps or opts.num_ceps,
                use_energy=opts.use_energy)
        else:
            opts = MfccOptions(frame_opts=frame_opts, mel_opts=opts.mel_opts,
                               num_ceps=opts.num_ceps,
                               use_energy=opts.use_energy)
        compute = compute_mfcc
    else:
        mel = MelOptions(num_bins=args.num_mel_bins or 23)
        opts = FbankOptions(frame_opts=frame_opts, mel_opts=mel)
        compute = compute_fbank

    factors = ([float(x) for x in args.speed_perturb.split(",")]
               if args.speed_perturb else [1.0])

    from kaldi_ctc_tpu.features.resample import speed_perturb

    n = 0
    with MatrixWriter(args.out, compress=bool(args.compress)) as w:
        for key, path in SequentialTextReader(args.wav_scp):
            samples, rate = read_wave(path.strip())
            for factor in factors:
                wave_np = speed_perturb(samples[0], rate, factor)
                wave = jnp.asarray(wave_np)
                out_key = (key if factor == 1.0
                           else f"sp{factor:g}-{key}")
                if args.type == "pitch":
                    feats = compute_and_process_pitch(wave_np,
                                                      seed=args.seed)
                else:
                    key_rng = (jax.random.PRNGKey(
                        args.seed + hash(out_key) % (2 ** 31))
                        if args.dither > 0 else None)
                    feats = np.asarray(compute(wave, opts,
                                               dither_key=key_rng))
                    if args.add_pitch:
                        pf = compute_and_process_pitch(wave_np,
                                                       seed=args.seed)
                        t = min(feats.shape[0], pf.shape[0])
                        feats = np.concatenate([feats[:t], pf[:t]], axis=1)
                w[out_key] = feats
                n += 1
    log.info("wrote %d feature matrices", n)


if __name__ == "__main__":
    main()
