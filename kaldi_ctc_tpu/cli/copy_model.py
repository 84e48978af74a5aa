"""Model surgery + export — the nnet-am-copy analogue.

Covers the final-model stage of training (``steps/ctc/train.sh:458-509``
and ``nnet2bin/nnet-am-copy``): pick a checkpoint, optionally remove
dropout (``--remove-dropout``, the reference's final.mdl step), attach
the prior vector, and write a single-file inference artifact that
decode_ctc can consume via ``--model``.  (The reference's
``--learning-rate`` edit has no analogue here: learning rates live in
the training schedule, not the model.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def parse_args(argv=None):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    argv = expand_config_args(argv)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", required=True, help="experiment directory")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--remove-dropout", type=int, default=1)
    p.add_argument("--output", required=True,
                   help="inference artifact path (.npz)")
    return p.parse_args(argv)


def main(argv=None):
    import jax

    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.models.artifact import save_inference_artifact
    from kaldi_ctc_tpu.training import init_train_state
    from kaldi_ctc_tpu.training.checkpoint import (
        cfg_for_checkpoint, restore_checkpoint)
    from kaldi_ctc_tpu.utils import get_logger

    args = parse_args(argv)
    log = get_logger("copy_model")

    with open(os.path.join(args.dir, "model_config.json")) as f:
        cfg = AmConfig.from_dict(json.load(f))
    # growth rewrites the config before a checkpoint at the new size
    # exists; the chosen checkpoint's meta is the truth for the template
    cfg = cfg_for_checkpoint(os.path.join(args.dir, "checkpoints"),
                             cfg, step=args.step)
    if args.remove_dropout and cfg.dropout > 0:
        cfg = dataclasses.replace(cfg, dropout=0.0)
        log.info("removed dropout")

    state = init_train_state(init_am_params(jax.random.PRNGKey(0), cfg))
    state, meta = restore_checkpoint(
        os.path.join(args.dir, "checkpoints"), state, step=args.step)

    priors = None
    priors_path = os.path.join(args.dir, "priors.npy")
    if os.path.exists(priors_path):
        priors = np.load(priors_path)
        log.info("attached priors from %s", priors_path)

    save_inference_artifact(args.output, state.params, cfg, priors)
    log.info("wrote %s (step %d)", args.output, meta["step"])


if __name__ == "__main__":
    main()
