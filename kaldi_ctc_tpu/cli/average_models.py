"""Average model checkpoints (nnet-am-average — the reference's DP combiner,
steps/ctc/train.sh:431-435).

In this framework synchronous DP makes per-iteration averaging unnecessary,
but the tool is kept for parity experiments (K-step averaging mode) and for
checkpoint ensembling.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    from kaldi_ctc_tpu.utils.options import expand_config_args
    argv = expand_config_args(argv)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", required=True, help="experiment dir")
    p.add_argument("--steps", type=int, nargs="+", required=True,
                   help="checkpoint steps to average")
    p.add_argument("--out-step", type=int, required=True,
                   help="step id for the averaged checkpoint")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.training import init_train_state
    from kaldi_ctc_tpu.training.checkpoint import (
        restore_checkpoint, save_checkpoint)

    args = parse_args(argv)
    with open(os.path.join(args.dir, "model_config.json")) as f:
        cfg = AmConfig.from_dict(json.load(f))
    like = init_train_state(init_am_params(jax.random.PRNGKey(0), cfg))
    ckpt_dir = os.path.join(args.dir, "checkpoints")

    states = []
    for s in args.steps:
        st, _ = restore_checkpoint(ckpt_dir, like, step=s)
        states.append(st)
    n = len(states)
    avg = jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *states)
    # step counter: use the max source step
    avg = avg._replace(step=max(st.step for st in states))
    save_checkpoint(ckpt_dir, args.out_step, avg,
                    extra={"averaged_from": args.steps})
    print(f"averaged {n} checkpoints -> step_{args.out_step}")


if __name__ == "__main__":
    main()
