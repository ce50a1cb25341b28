"""Parallelism layer: mesh, sharded compute, sequence parallelism, work queue."""

from .mesh import (  # noqa: F401
    data_sharding,
    gmm_sharding,
    init_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from .sequence import SpFrontend, sp_viterbi_align  # noqa: F401
from .sharded import (  # noqa: F401
    ShardedGmmScorer,
    dp_accumulate,
    dp_decode,
    psum_counters,
)
