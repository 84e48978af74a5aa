"""Diagnostic objf/accuracy on a fixed egs set (nnet2-ctc-compute-prob).

Reads a checkpoint + diagnostic data, prints loss per frame and the
greedy-collapse label accuracy with the reference's parseable line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--feats", required=True)
    p.add_argument("--ali", required=True)
    p.add_argument("--cmvn", default=None)
    p.add_argument("--utt2spk", default=None)
    p.add_argument("--dir", required=True, help="experiment dir with "
                   "model_config.json + checkpoints/")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--minibatch-size", type=int, default=48)
    p.add_argument("--frame-subsampling-factor", type=int, default=1)
    return p.parse_args(argv)


def main(argv=None):
    import jax
    from kaldi_ctc_tpu.data import EgsPipeline, load_examples
    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.training import (
        accuracy_from_outputs, init_train_state, make_eval_step)
    from kaldi_ctc_tpu.training.checkpoint import restore_checkpoint
    from kaldi_ctc_tpu.utils import MetricsLogger, get_logger
    from kaldi_ctc_tpu.utils.kaldi_io import SequentialTextReader

    args = parse_args(argv)
    log = get_logger("compute_prob")
    with open(os.path.join(args.dir, "model_config.json")) as f:
        cfg = AmConfig.from_dict(json.load(f))

    utt2spk = dict(SequentialTextReader(args.utt2spk)) if args.utt2spk else None
    examples = list(load_examples(args.feats, args.ali,
                                  cmvn_rspecifier=args.cmvn, utt2spk=utt2spk))
    if not examples:
        log.error("no examples"); sys.exit(1)

    params = init_am_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params)
    state, meta = restore_checkpoint(
        os.path.join(args.dir, "checkpoints"), state, step=args.step)

    pipe = EgsPipeline(examples, minibatch_size=args.minibatch_size,
                       frame_subsampling_factor=args.frame_subsampling_factor)
    eval_step = make_eval_step(cfg)
    tot_loss = 0.0
    tot_frames = tot_err = tot_ref = 0
    for batch in pipe.epoch(0):
        batch.pop("keys")
        out = eval_step(state.params, batch)
        _, e, r = accuracy_from_outputs(out, batch["labels"],
                                        batch["label_lens"])
        tot_err += e; tot_ref += r
        tot_loss += float(out["loss_total"])
        tot_frames += int(out["num_frames"])
    acc = 1.0 - tot_err / max(tot_ref, 1)
    MetricsLogger().log_accuracy(acc, step=meta["step"])
    print(json.dumps({
        "step": meta["step"],
        "loss_per_frame": tot_loss / max(tot_frames, 1),
        "accuracy": acc,
        "num_frames": tot_frames,
    }))


if __name__ == "__main__":
    main()
