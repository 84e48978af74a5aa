"""Core compute ops: CTC loss (alpha-beta) and recurrent stacks."""

from kaldi_ctc_tpu.ops.ctc import (  # noqa: F401
    ctc_loss,
    ctc_loss_and_grad,
    greedy_collapse,
)
from kaldi_ctc_tpu.ops.rnn import (  # noqa: F401
    RnnConfig,
    RnnMode,
    init_rnn_params,
    rnn_forward,
)
