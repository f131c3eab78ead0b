"""Parallelism: GSPMD sharding rules + shard_map GPipe pipeline.

TPU-native replacement for the reference's DeepSpeed distributed runtime
(SURVEY.md section 2.3): NCCL p2p activation hand-off becomes ppermute over
the 'stage' mesh axis, DP grad all-reduce becomes an XLA psum inserted by
GSPMD, and tensor parallelism (absent in the reference) falls out of
Partitioned param metadata.
"""

from .sharding import get_params_sharding, shard_params  # noqa: F401
from .pipeline import gpipe_phase, ring_shift  # noqa: F401
