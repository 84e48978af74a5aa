"""Print model info (nnet-am-info equivalent)."""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", required=True)
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import numpy as np
    from kaldi_ctc_tpu.models import AmConfig, init_am_params
    from kaldi_ctc_tpu.training import init_train_state
    from kaldi_ctc_tpu.training.checkpoint import (
        cfg_for_checkpoint, latest_step, restore_checkpoint)

    with open(os.path.join(args.dir, "model_config.json")) as f:
        cfg_d = json.load(f)
    cfg = AmConfig.from_dict(cfg_d)
    ckpt_dir = os.path.join(args.dir, "checkpoints")
    info = dict(cfg_d)
    step = args.step if args.step is not None else latest_step(ckpt_dir)
    if step is not None:
        # growth rewrites the config before a checkpoint at the new
        # size exists; the checkpoint meta is the template's truth
        cfg = cfg_for_checkpoint(ckpt_dir, cfg, step=step)
        info["num_layers"] = cfg.num_layers
        like = init_train_state(init_am_params(jax.random.PRNGKey(0),
                                               cfg))
        state, meta = restore_checkpoint(ckpt_dir, like, step=step)
        leaves = jax.tree_util.tree_leaves(state.params)
        info["checkpoint_step"] = meta["step"]
        info["num_parameters"] = int(sum(np.asarray(l).size for l in leaves))
        info["parameter_norm"] = float(np.sqrt(sum(
            float((np.asarray(l) ** 2).sum()) for l in leaves)))
    print(json.dumps(info, indent=2))


if __name__ == "__main__":
    main()
