"""Language models: ARPA parsing, scoring, and G.fst compilation."""

from kaldi_ctc_tpu.lm.arpa import (  # noqa: F401
    ArpaLm,
    arpa_to_fst_arrays,
    parse_arpa,
    sentence_logprob,
)
