"""Multi-host runtime: jax.distributed wiring + per-process batch feeding.

The TPU-native replacement for the reference's empty distributed placeholder
(src/training/training.py:541-545), covering SURVEY §2.10's scope: "a
jax.distributed-initialized runtime; a device mesh abstraction over ICI (and
DCN for multi-host) ...; per-host data loading with sharded batch feeding."

Model: JAX multi-controller SPMD. Every process runs the same program;
`jax.distributed.initialize` connects them; the mesh is built over GLOBAL
devices; each process feeds only the batch rows its own devices will hold,
and `jax.make_array_from_process_local_data` assembles the global array.
Axis order puts 'data' outermost so cross-host (DCN) traffic is the gradient
reduce only — the TP axis, when used, stays within a host's ICI domain.

Single-process use is a transparent no-op: `initialize_runtime()` skips
`jax.distributed.initialize` and all helpers degrade to plain device_put.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_deer.parallel.mesh import MeshConfig, create_mesh


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """How to join (or not) a multi-process JAX cluster.

    All fields optional: on TPU pods the usual call is
    `initialize_runtime(RuntimeConfig(multiprocess=True))` and JAX discovers
    coordinator/process topology from the TPU metadata environment. For
    explicit wiring (CPU/GPU clusters, tests) set all three of
    coordinator_address / num_processes / process_id.
    """

    multiprocess: bool = False
    coordinator_address: Optional[str] = None  # "host:port"
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    local_device_ids: Optional[Sequence[int]] = None


class DistributedRuntime:
    """A thin handle over the (possibly single-process) global device world."""

    def __init__(self, initialized_distributed: bool):
        self.initialized_distributed = initialized_distributed

    # -- topology ------------------------------------------------------------
    @property
    def process_index(self) -> int:
        return jax.process_index()

    @property
    def process_count(self) -> int:
        return jax.process_count()

    @property
    def global_devices(self):
        return jax.devices()

    @property
    def local_devices(self):
        return jax.local_devices()

    def global_mesh(self, config: Optional[MeshConfig] = None) -> Mesh:
        """('data', 'model') mesh over ALL processes' devices. Device order is
        jax.devices() order (process-major), which is what the per-process
        batch slicing in BatchIterator assumes."""
        return create_mesh(config, devices=jax.devices())

    # -- placement -----------------------------------------------------------
    def shard_batch(self, batch: Mapping[str, Any], mesh: Mesh) -> dict:
        """Assemble a global batch sharded over 'data' from per-process rows.

        Each process passes ONLY its local rows (global_batch/process_count,
        produced by BatchIterator(..., process_index, process_count)); the
        returned arrays are global. Single-process degrades to device_put.
        """
        sharding = NamedSharding(mesh, P("data"))
        if self.process_count == 1:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }

    def put_params(self, params: Any, mesh: Mesh, mode: str = "tp") -> Any:
        """Place a parameter pytree on the global mesh per the layout rules
        (mode: 'tp' | 'fsdp' | 'replicated' | 'ensemble', see
        parallel.mesh.shard_params).
        Every process holds the full host copy; each contributes the shards
        its own devices own (make_array_from_callback), so this works
        across processes where plain device_put cannot."""
        if self.process_count == 1:
            from tpu_deer.parallel.mesh import shard_params

            return shard_params(params, mesh, mode=mode)

        from tpu_deer.parallel.mesh import param_spec

        data_size = mesh.shape.get("data", 1)
        model_size = mesh.shape.get("model", 1)

        def place(path, leaf):
            spec = param_spec(path, leaf, mode, data_size, model_size)
            sharding = NamedSharding(mesh, spec)
            leaf = np.asarray(leaf)
            return jax.make_array_from_callback(
                leaf.shape, sharding, lambda idx: leaf[idx]
            )

        return jax.tree_util.tree_map_with_path(place, params)


def initialize_runtime(
    config: Optional[RuntimeConfig] = None,
) -> DistributedRuntime:
    """Wire up jax.distributed when asked (or when the env demands it) and
    return the runtime handle. Safe to call in single-process programs."""
    config = config or RuntimeConfig()
    want_distributed = (
        config.multiprocess
        or config.coordinator_address is not None
        or os.environ.get("TPU_DEER_MULTIPROCESS") == "1"
    )
    if want_distributed:
        kwargs: dict[str, Any] = {}
        if config.coordinator_address is not None:
            kwargs["coordinator_address"] = config.coordinator_address
        if config.num_processes is not None:
            kwargs["num_processes"] = config.num_processes
        if config.process_id is not None:
            kwargs["process_id"] = config.process_id
        if config.local_device_ids is not None:
            kwargs["local_device_ids"] = list(config.local_device_ids)
        jax.distributed.initialize(**kwargs)
        return DistributedRuntime(initialized_distributed=True)
    return DistributedRuntime(initialized_distributed=False)


def shutdown_runtime(runtime: DistributedRuntime) -> None:
    if runtime.initialized_distributed:
        jax.distributed.shutdown()
