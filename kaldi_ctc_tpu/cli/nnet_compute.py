"""Forward-pass dumps — the nnet2-ctc-compute analogue
(``ctcbin/nnet2-ctc-compute.cc``): run the acoustic model over
utterances and write per-frame outputs (raw logits, log-softmax, or
posteriors) as a Kaldi matrix archive, for prior estimation, inspection,
or external decoders.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def parse_args(argv=None):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    argv = expand_config_args(argv)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feats", default=None)
    p.add_argument("--egs", default=None,
                   help="prepared egs archive instead of --feats "
                        "(nnet2-ctc-compute-from-egs: the posterior-"
                        "prior route of steps/ctc/train.sh:485-492 "
                        "forwards stored egs)")
    p.add_argument("--cmvn", default=None)
    p.add_argument("--utt2spk", default=None)
    p.add_argument("--dir", default=None)
    p.add_argument("--model", default=None, help="inference artifact (.npz)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--output", required=True,
                   help="wspecifier for outputs (ark: / ark,scp:)")
    p.add_argument("--what", choices=["logits", "log-post", "post"],
                   default="log-post")
    p.add_argument("--frame-subsampling-factor", type=int, default=1)
    p.add_argument("--minibatch-size", type=int, default=16)
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from kaldi_ctc_tpu.data import CtcExample, frame_subsample, pad_batch
    from kaldi_ctc_tpu.data.bucketing import make_buckets
    from kaldi_ctc_tpu.features.cmvn import apply_cmvn
    from kaldi_ctc_tpu.models import am_forward
    from kaldi_ctc_tpu.utils import get_logger, kaldi_io
    from kaldi_ctc_tpu.utils.kaldi_io import (
        SequentialMatrixReader, SequentialTextReader,
        open_random_access_matrices)

    args = parse_args(argv)
    log = get_logger("nnet_compute")

    from kaldi_ctc_tpu.models.artifact import load_acoustic_model
    try:
        params, cfg, _, _ = load_acoustic_model(args.model, args.dir,
                                                args.step)
    except ValueError as e:
        log.error("%s", e); sys.exit(1)

    utt2spk = (dict(SequentialTextReader(args.utt2spk))
               if args.utt2spk else None)
    cmvn = open_random_access_matrices(args.cmvn) if args.cmvn else None

    @jax.jit
    def forward(feats, lens):
        logits = am_forward(params, feats, cfg, input_lens=lens)
        if args.what == "logits":
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.exp(logp) if args.what == "post" else logp

    egs = []
    if args.egs:
        from kaldi_ctc_tpu.data.egs_io import SequentialEgsReader
        for e in SequentialEgsReader(args.egs):
            feats = frame_subsample(e.feats,
                                    args.frame_subsampling_factor)
            egs.append(CtcExample(e.key, feats, e.labels))
    elif args.feats:
        for key, feats in SequentialMatrixReader(args.feats):
            if cmvn is not None:
                spk = utt2spk.get(key, key) if utt2spk else key
                if spk in cmvn:
                    feats = np.asarray(apply_cmvn(feats, cmvn[spk]))
            feats = frame_subsample(np.asarray(feats, np.float32),
                                    args.frame_subsampling_factor)
            egs.append(CtcExample(key, feats, np.zeros(1, np.int32)))
    else:
        log.error("need --feats or --egs"); sys.exit(1)

    frame_buckets = make_buckets()
    n = 0
    with kaldi_io.MatrixWriter(args.output) as w:
        for i in range(0, len(egs), args.minibatch_size):
            group = egs[i:i + args.minibatch_size]
            batch = pad_batch(group, frame_buckets, [4])
            out = np.asarray(forward(jnp.asarray(batch["feats"]),
                                     jnp.asarray(batch["input_lens"])))
            score_lens = np.asarray(cfg.output_lens(batch["input_lens"]))
            for j, e in enumerate(group):
                t = int(score_lens[j])
                w[e.key] = out[j, :t]
                n += 1
    log.info("wrote %s for %d utterances", args.what, n)


if __name__ == "__main__":
    main()
