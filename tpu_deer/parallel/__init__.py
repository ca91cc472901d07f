"""SPMD parallelism: device mesh, sharding rules, distributed metrics,
multi-host runtime, ring-attention sequence parallelism, GPipe pipeline."""

from tpu_deer.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_sharding_rules,
    fsdp_sharding_rules,
    shard_params,
    shard_batch,
    shard_moe_params,
)
from tpu_deer.parallel.pipeline import pipeline_apply, pipeline_sharded
from tpu_deer.parallel.sequence import ring_attention, ring_attention_sharded
from tpu_deer.parallel.dist_metrics import global_ccc_stats, psum_tree
from tpu_deer.parallel.runtime import (
    DistributedRuntime,
    RuntimeConfig,
    initialize_runtime,
    shutdown_runtime,
)
