"""Decoders: greedy best-path, batched CTC prefix beam search.

(The WFST TLG lattice decoder that mirrors LatticeFasterDecoder lives in
native code consuming `acoustic_scores` + `skip_mask`; see decoding/wfst.)
"""

from kaldi_ctc_tpu.decoding.greedy import greedy_decode  # noqa: F401
from kaldi_ctc_tpu.decoding.prefix_beam import prefix_beam_search  # noqa: F401
from kaldi_ctc_tpu.decoding.scores import acoustic_scores  # noqa: F401
