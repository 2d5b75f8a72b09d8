"""Device-mesh parallelism: data-parallel training and sharded inference.

The reference has no intra-job parallelism at all — its only scale-out is
Slurm array jobs of independent processes (SURVEY.md §2.2, reference
cluster_scripts/gen_eval_exp.py, gen_train_exp.py).  Here scale-out is
XLA-native: a ``jax.sharding.Mesh`` over the chips, replicated parameters,
batch/channel dimensions sharded over the ``data`` axis, and XLA inserting
the ICI collectives (grad all-reduce) automatically from the sharding
annotations.
"""

from laughter_detection_icsi_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_local_batch,
)
from laughter_detection_icsi_tpu.parallel.data_parallel import (  # noqa: F401
    DataParallelTrainer,
)
from laughter_detection_icsi_tpu.parallel.sharded_inference import (  # noqa: F401
    ShardedPipeline,
    ShardedStreamingSession,
)
from laughter_detection_icsi_tpu.parallel import distributed  # noqa: F401
