"""Foundation utilities: Kaldi-format I/O, edit distance, logging, config."""

from kaldi_ctc_tpu.utils.logging import MetricsLogger, Timer, get_logger  # noqa: F401
