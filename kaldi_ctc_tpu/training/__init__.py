"""Training loop, optimizer semantics, checkpointing."""

from kaldi_ctc_tpu.training.train import (  # noqa: F401
    TrainOptions,
    TrainState,
    accuracy_from_outputs,
    build_train_step,
    exponential_lr,
    init_train_state,
    make_eval_step,
    make_train_step,
)
