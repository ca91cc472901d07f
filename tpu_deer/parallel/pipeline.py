"""Pipeline parallelism: GPipe microbatch schedule over a 'stage' mesh axis.

The reference is single-device (SURVEY §2.10: no pipeline parallelism
anywhere); this is the TPU-native scaling extension for deep stage-stacked
trunks (e.g. stacked residual blocks in the encoders, models/layers.py).
Device i holds the parameters of stage i only (leading stage axis sharded
over 'stage'), so model memory scales 1/S. Microbatches stream through the
ring: at each schedule tick every device applies its stage to the activation
it holds, then passes the result to the next stage over ICI via
`jax.lax.ppermute`. With M microbatches and S stages the schedule runs
M + S - 1 ticks; bubble fraction (S-1)/(M+S-1) — choose M >= 4·S to keep the
MXU busy.

All control flow is a single `lax.scan` (one compiled program, no Python
loop over ticks), and the whole schedule is differentiable — ppermute's VJP
is the reverse-direction hop, so backprop replays the pipeline in reverse
without any hand-written schedule.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    x: jax.Array,
    *,
    num_microbatches: int,
    axis_name: str = "stage",
) -> jax.Array:
    """Run `x` through S pipeline stages; call inside shard_map.

    Args:
      stage_fn: shape-preserving stage body `(params_i, h) -> h` where the
        LOCAL params pytree has the stage axis already stripped (leaves are
        one stage's parameters). Shape-preservation is required because the
        same activation buffer rides the ring between all stages.
      stage_params: local shard of the stacked parameters — leaves
        [1, ...] (leading global axis S sharded over `axis_name`); the
        leading 1 is squeezed before calling stage_fn.
      x: full input batch [B, ...] (replicated across stages); it is split
        into `num_microbatches` equal microbatches along axis 0.

    Returns [B, ...] — the final-stage outputs, replicated to every stage
    (one psum over the stage axis at the end).
    """
    s = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = num_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    mb = b // m
    x_stack = x.reshape((m, mb) + x.shape[1:])

    local_params = jax.tree_util.tree_map(lambda p: p[0], stage_params)
    # A stage-varying zero: fresh zeros are axis-invariant under shard_map's
    # varying-axis typing, but the scan carry becomes stage-varying after one
    # ppermute — seed the buffers from the (stage-sharded) params so the
    # carry type is fixed from tick zero.
    zvar = (
        sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(local_params)) * 0.0
    )

    recv0 = (jnp.zeros((mb,) + x.shape[1:], x.dtype) + zvar).astype(x.dtype)
    outbuf0 = (
        jnp.zeros((m, mb) + x.shape[1:], x.dtype) + zvar
    ).astype(x.dtype)
    # stage i -> i+1; no wraparound (stage S-1's send is dropped).
    perm = [(i, i + 1) for i in range(s - 1)]

    def tick(carry, t):
        recv, outbuf = carry
        feed = jax.lax.dynamic_index_in_dim(
            x_stack, jnp.clip(t, 0, m - 1), keepdims=False
        )
        h = jnp.where(idx == 0, feed, recv)
        out = stage_fn(local_params, h)
        # Last stage completes microbatch t-(S-1) at tick t.
        done = jnp.clip(t - (s - 1), 0, m - 1)
        store = (idx == s - 1) & (t >= s - 1)
        prev = jax.lax.dynamic_index_in_dim(outbuf, done, keepdims=False)
        outbuf = jax.lax.dynamic_update_index_in_dim(
            outbuf, jnp.where(store, out, prev), done, axis=0
        )
        recv = jax.lax.ppermute(out, axis_name, perm)
        return (recv, outbuf), None

    (_, outbuf), _ = jax.lax.scan(
        tick, (recv0, outbuf0), jnp.arange(m + s - 1)
    )
    # Only the last stage ever wrote non-zeros; psum replicates its buffer.
    full = jax.lax.psum(
        jnp.where(idx == s - 1, outbuf, jnp.zeros_like(outbuf)), axis_name
    )
    return full.reshape((b,) + x.shape[1:])


def pipeline_sharded(
    mesh: Mesh,
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    num_microbatches: int,
    axis_name: str = "stage",
) -> jax.Array:
    """Canonical wrapper: stacked_params leaves are [S, ...] (one slice per
    stage, e.g. from a vmap'd init); the leading axis shards over
    `axis_name`, x stays replicated, output comes back replicated."""
    param_specs = jax.tree_util.tree_map(
        lambda p: P(axis_name, *([None] * (p.ndim - 1))), stacked_params
    )
    fn = shard_map(
        partial(
            pipeline_apply,
            stage_fn,
            num_microbatches=num_microbatches,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
    )
    return fn(stacked_params, x)
