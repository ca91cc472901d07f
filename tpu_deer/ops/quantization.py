"""Int8 weight quantization for serving.

Symmetric per-output-channel int8 quantization of Dense kernels (everything
else — biases, norms, small heads — stays float32). ~4× smaller weights for
the serving path at negligible accuracy cost (tested: quantized predictions
match float within noise on a trained model).

Two rounding modes:
  * nearest (default) — plain deterministic quantization;
  * stochastic — a Pallas kernel using the TPU hardware PRNG
    (pltpu.prng_random_bits + pltpu.stochastic_round), the pattern for
    on-device quantization inside training loops.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Scale sentinel for non-quantized leaves: an empty array (None would vanish
# from the pytree structure).
_PASSTHROUGH = np.zeros(0, dtype=np.float32)


def _is_quantizable(path: tuple, leaf, member_stacked: bool = False) -> bool:
    # Plain trees: 2-D Dense kernels [in, out] only. Member-stacked trees
    # (train/ensemble.py — EVERY leaf carries a leading member axis): the
    # same kernels are 3-D [K, in, out], so the contraction axis is still
    # axis -2 by construction. Kernels whose un-stacked form is not 2-D
    # (BilinearFusion's bilinear_kernel, nn.vmap-stacked MoE expert kernels)
    # fall outside the expected ndim and keep passing through in float —
    # their contraction axes are NOT -2 and must not use these scales.
    name = "/".join(getattr(k, "key", str(k)) for k in path)
    ndim = 3 if member_stacked else 2
    return (
        getattr(leaf, "ndim", 0) == ndim
        and leaf.shape[-2] >= 8
        and name.endswith("kernel")
    )


def quantize_tree(params: Any, member_stacked: bool = False) -> tuple[Any, Any]:
    """params → (q_tree, scale_tree).

    Quantizable kernels become int8 with a float32 per-output-channel scale;
    other leaves pass through unchanged (empty scale sentinel).
    `member_stacked=True` declares a deep-ensemble tree whose every leaf has
    a leading member axis: the stacked [K, in, out] kernels quantize with
    per-member per-channel [K, out] scales.
    """
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    q_leaves, s_leaves = [], []
    for path, leaf in paths_leaves:
        arr = np.asarray(leaf)
        if _is_quantizable(path, arr, member_stacked):
            w = arr.astype(np.float32)
            # reduce the contraction axis: [out] for 2-D, [K, out] for 3-D
            scale = np.maximum(np.abs(w).max(axis=-2), 1e-8) / 127.0
            q = np.clip(
                np.round(w / scale[..., None, :]), -127, 127
            ).astype(np.int8)
            q_leaves.append(q)
            s_leaves.append(scale.astype(np.float32))
        else:
            q_leaves.append(arr)
            s_leaves.append(_PASSTHROUGH)
    return (
        jax.tree_util.tree_unflatten(treedef, q_leaves),
        jax.tree_util.tree_unflatten(treedef, s_leaves),
    )


def dequantize_tree(q_tree: Any, scale_tree: Any) -> Any:
    """Inverse of quantize_tree → float32 params."""

    def deq(q, scale):
        q = np.asarray(q)
        scale = np.asarray(scale)
        if scale.size == 0:
            return q
        return q.astype(np.float32) * scale[..., None, :]

    return jax.tree_util.tree_map(deq, q_tree, scale_tree)


def dequantize_tree_device(q_tree: Any, scale_tree: Any, dtype=None) -> Any:
    """Traceable dequantize for use INSIDE a jitted forward.

    Unlike `dequantize_tree` (host numpy, used for offline round-trips), this
    emits jnp ops, so the int8 kernels stay int8 in HBM and XLA fuses the
    cast+scale into the consuming matmul: the serving path reads 4x fewer
    weight bytes per request, which is where the time goes for a
    weight-traffic-bound small-batch forward.
    """

    def deq(q, scale):
        if getattr(scale, "size", 0) == 0:
            return q
        out = q.astype(dtype or jnp.float32) * scale[..., None, :].astype(
            dtype or jnp.float32
        )
        return out

    return jax.tree_util.tree_map(deq, q_tree, scale_tree)


def quantized_size_bytes(q_tree: Any) -> int:
    return sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(q_tree))


def quantize_int8_stochastic(
    w: jax.Array, seed: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Pallas kernel: per-tensor int8 quantization with stochastic rounding.

    On TPU the uniform noise comes from the hardware PRNG
    (pltpu.prng_random_bits) inside the kernel. On other backends the same
    kernel math runs under the Pallas interpreter with the random bits
    supplied from jax.random — the hardware PRNG primitives have no CPU
    interpreter rule, so this mirrors flash_attention's interpret path and
    keeps the rounding logic testable everywhere.

    Returns (int8 values, float32 scale as [1, 1]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def quantize_body(x, u, values_ref, scale_ref):
        # Integer stochastic rounding: floor(x/scale + u), u ~ U[0, 1)
        # (pltpu.stochastic_round only targets bf16/fp8, so roll our own).
        abs_max = jnp.max(jnp.abs(x))
        scale = jnp.maximum(abs_max, 1e-8) / 127.0
        scale_ref[0, 0] = scale
        q = jnp.floor(x / scale + u)
        values_ref[:] = jnp.clip(q, -127, 127).astype(jnp.int8)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:

        def kernel(seed_ref, x_ref, values_ref, scale_ref):
            pltpu.prng_seed(seed_ref[0])
            bits = pltpu.bitcast(
                pltpu.prng_random_bits(x_ref.shape), jnp.uint32
            )
            # Mosaic lacks uint32→f32 casts: keep the top 24 bits, via int32.
            bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
            u = bits24.astype(jnp.float32) * (1.0 / 16777216.0)
            quantize_body(x_ref[:], u, values_ref, scale_ref)

        noise_arg = jnp.asarray([seed], dtype=jnp.int32)
        noise_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:

        def kernel(bits_ref, x_ref, values_ref, scale_ref):
            u = (bits_ref[:] >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
            quantize_body(x_ref[:], u, values_ref, scale_ref)

        noise_arg = jax.random.bits(
            jax.random.PRNGKey(seed), shape=w.shape, dtype=jnp.uint32
        )
        noise_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    values, scale = pl.pallas_call(
        kernel,
        in_specs=[
            noise_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.int8),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=not on_tpu,
    )(noise_arg, w.astype(jnp.float32))
    return values, scale
