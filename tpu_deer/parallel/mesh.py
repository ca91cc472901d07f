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


def fsdp_sharding_rules(path: tuple, leaf, data_size: int) -> P:
    """Fully-sharded (ZeRO-style) layout: shard the largest eligible axis of
    every >=2-D parameter over 'data', composed with the TP rules over
    'model'. Optimizer state inherits the layout (optax init follows input
    shardings), so params + Adam moments are all partitioned — per-device
    memory for the model state drops ~1/N while XLA inserts the all-gathers
    at use sites and reduce-scatters for the gradients (the scaling-book
    FSDP recipe; no hand-written collectives).

    Axes whose size is not divisible by the data-axis extent stay unsharded
    (uneven partitions would force padded collectives); 1-D leaves (biases,
    norms) stay replicated — they are a rounding error of the memory.
    """
    tp = param_sharding_rules(path, leaf)
    if leaf.ndim < 2 or data_size <= 1:
        return tp
    spec = list(tp) if len(tp) == leaf.ndim else [None] * leaf.ndim
    candidates = [
        i
        for i in range(leaf.ndim)
        if spec[i] is None and leaf.shape[i] % data_size == 0
    ]
    if candidates:
        spec[max(candidates, key=lambda i: leaf.shape[i])] = "data"
    return P(*spec)


def ensemble_sharding_rules(path: tuple, leaf, model_size: int) -> P:
    """Deep-ensemble layout: every parameter carries a leading MEMBER axis
    (stacked by train/ensemble.py) — shard it over 'model'. Members never
    exchange activations or gradients, so this is embarrassingly parallel:
    K members on D devices run K/D fully independent models with ZERO
    cross-member collectives (the only mesh traffic is the batch broadcast
    over 'model' and the DP gradient psum over 'data').

    Member counts not divisible by the axis extent stay replicated rather
    than padding the stack."""
    if leaf.ndim >= 1 and model_size > 1 and leaf.shape[0] % model_size == 0:
        return P(*(["model"] + [None] * (leaf.ndim - 1)))
    return P()


PARAM_SHARDING_MODES = ("tp", "fsdp", "replicated", "ensemble")


def param_spec(path: tuple, leaf, mode: str, data_size: int, model_size: int = 1) -> P:
    """Single dispatch point for the parameter-layout modes (used by both
    single-host shard_params and the multi-host runtime). Raises on an
    unknown mode — a typo must not silently train with the TP layout."""
    if mode == "tp":
        return param_sharding_rules(path, leaf)
    if mode == "fsdp":
        return fsdp_sharding_rules(path, leaf, data_size)
    if mode == "ensemble":
        return ensemble_sharding_rules(path, leaf, model_size)
    if mode == "replicated":
        return P()
    raise ValueError(
        f"unknown param_sharding mode {mode!r}; expected one of "
        f"{PARAM_SHARDING_MODES}"
    )


def shard_params(params, mesh: Mesh, mode: str = "tp"):
    """Place a parameter pytree on the mesh.

    mode: 'tp' (default — TP kernels over 'model', rest replicated),
    'fsdp' (every large param sharded over 'data', composed with TP),
    'ensemble' (leading member axis over 'model' — see train/ensemble.py),
    'replicated' (everything everywhere).
    """
    data_size = mesh.shape.get("data", 1)
    model_size = mesh.shape.get("model", 1)

    def place(path, leaf):
        spec = param_spec(path, leaf, mode, data_size, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_moe_params(params, mesh: Mesh, axis_name: str = "expert"):
    """Expert-parallel placement for MoEFusion (models/fusion.py): leaves
    under an 'experts' module carry a leading expert axis (stacked by
    nn.vmap) and shard it over `axis_name`; everything else (gate, the rest
    of the model) replicates. XLA then partitions the per-expert MLPs across
    devices and inserts the psum for the gate-weighted mixture reduction."""

    def place(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        if "experts" in keys and leaf.ndim >= 1:
            spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
