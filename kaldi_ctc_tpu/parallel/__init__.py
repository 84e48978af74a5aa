"""Mesh/device management and sharding rules for SPMD training."""

from kaldi_ctc_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
)
