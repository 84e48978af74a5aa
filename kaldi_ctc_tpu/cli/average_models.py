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
        cfg_for_checkpoint, read_meta, restore_checkpoint,
        save_checkpoint)

    args = parse_args(argv)
    with open(os.path.join(args.dir, "model_config.json")) as f:
        cfg = AmConfig.from_dict(json.load(f))
    ckpt_dir = os.path.join(args.dir, "checkpoints")
    # templates must match each SOURCE checkpoint's saved layer count
    # (growth rewrites the config before checkpoints at the new size
    # exist), and averaging across different sizes is meaningless
    cfgs = [cfg_for_checkpoint(ckpt_dir, cfg, step=s) for s in args.steps]
    if len({c.num_layers for c in cfgs}) != 1:
        raise SystemExit(
            "checkpoints span different layer counts "
            f"({[c.num_layers for c in cfgs]}): cannot average")
    cfg = cfgs[0]
    like = init_train_state(init_am_params(jax.random.PRNGKey(0), cfg))

    states = []
    metas = []
    for s in args.steps:
        st, m = restore_checkpoint(ckpt_dir, like, step=s)
        states.append(st)
        metas.append(m)
    n = len(states)
    avg = jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *states)
    # step counter: use the max source step
    avg = avg._replace(step=max(st.step for st in states))
    # carry the resume/serve metadata of the newest source so the
    # averaged checkpoint remains a valid resume/restore point
    newest = max(metas, key=lambda m: m["step"])
    extra = dict(newest.get("extra", {}))
    extra["averaged_from"] = args.steps
    extra["num_layers"] = cfg.num_layers
    save_checkpoint(ckpt_dir, args.out_step, avg, extra=extra)
    print(f"averaged {n} checkpoints -> step_{args.out_step}")


if __name__ == "__main__":
    main()
