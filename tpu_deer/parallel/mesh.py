"""Device mesh + sharding layout — the TPU-native replacement for the
reference's (empty) distributed placeholder (training.py:541-545).

Design (scaling-book recipe): pick a mesh, annotate shardings, let XLA insert
collectives.

  * Mesh axes: ('data', 'model'). Batches shard over 'data' (pure DP); the
    wide fusion/encoder matmuls optionally shard over 'model' (TP) so the
    design scales past one chip even though the 12M-param model only *needs*
    DP. Gradients are reduced by XLA automatically (jit over NamedSharding
    inputs inserts the psum over 'data').
  * Eval metrics use sufficient-statistics psum (see dist_metrics) instead of
    gathering predictions.
  * Multi-host: the same code works over DCN by building the mesh from
    jax.devices() after jax.distributed.initialize(); axis order puts 'data'
    outermost so cross-host traffic is gradient-reduce only.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1


def create_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for a batch pytree leaf."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(path: tuple, leaf) -> P:
    """Tensor-parallel layout rules for model parameters.

    Policy: shard the *output* feature axis of the big fusion/encoder kernels
    over 'model'; keep biases, norms, and small heads replicated. XLA inserts
    the all-gathers/reduce-scatters where the sharded matmuls meet.
    """
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    if leaf.ndim >= 2 and any(
        tag in name
        for tag in (
            "av_fusion_in",
            "av_fusion_out",
            "trimodal_fusion_in",
            "trimodal_fusion_out",
            "fusion_gate",
            "input_proj",
            "output_proj",
        )
    ):
        # Dense kernels are [in, out]: shard the out axis.
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per `param_sharding_rules`."""

    def place(path, leaf):
        spec = param_sharding_rules(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
