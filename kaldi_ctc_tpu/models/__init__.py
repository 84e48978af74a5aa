"""Acoustic model definitions (nnet2/AmNnet replacement)."""

from kaldi_ctc_tpu.models.acoustic import (  # noqa: F401
    AmConfig,
    am_forward,
    default_priors,
    init_am_params,
)
