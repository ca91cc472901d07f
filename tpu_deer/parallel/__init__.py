"""SPMD parallelism: device mesh, sharding rules, distributed metrics,
multi-host runtime."""

from tpu_deer.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_sharding_rules,
    fsdp_sharding_rules,
    shard_params,
    shard_batch,
)
from tpu_deer.parallel.dist_metrics import global_ccc_stats, psum_tree
from tpu_deer.parallel.runtime import (
    DistributedRuntime,
    RuntimeConfig,
    initialize_runtime,
    shutdown_runtime,
)
