"""Sequence parallelism: ring attention over a sharded time axis.

The reference has no sequence handling beyond single-utterance pooling
(reference encoders.py:383-387), and SURVEY §5 scopes sequence parallelism
out of the *parity* build. This module is the scaling extension that makes
the raw-sequence path (models/hierarchical_deer.py:RawSequenceDEERModel,
ops/flash_attention.py) long-context-capable past one chip: the time axis of
q/k/v is sharded over a 'seq' mesh axis, each device keeps its local Q block
resident, and K/V blocks rotate around the ring via `jax.lax.ppermute` while
an online-softmax accumulator (the same max/normalizer recurrence as the
Pallas flash kernel) combines partial results. Memory per device is
O(T/N · D); communication is the K/V block per hop riding ICI, overlappable
with the block matmuls by XLA's latency-hiding scheduler.

Designed for use inside `shard_map` (see ring_attention_sharded for the
canonical wrapper). Fully differentiable — the VJP of ppermute is the
reverse-direction ppermute, so gradients flow around the ring automatically;
no hand-written backward pass is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    *,
    axis_name: str = "seq",
) -> jax.Array:
    """Attention over a time axis sharded on `axis_name`.

    Must be called inside `shard_map` (or pmap) with the sequence dimension
    of q/k/v partitioned over `axis_name`. Shapes are the LOCAL shards:

      q, k, v : [B, H, T_local, D]
      kv_mask : [B, T_local] (1 = valid key), optional

    Returns the local output shard [B, H, T_local, D] equal to the
    corresponding slice of full softmax(q·kᵀ/√D + mask)·v over the GLOBAL
    sequence. Each of the N ring steps computes one Q-block × K-block tile
    and folds it into the running (acc, max, normalizer) state — numerically
    identical to blocked flash attention, with the block loop distributed
    over devices instead of over VMEM tiles.
    """
    n = jax.lax.psum(1, axis_name)
    b, h, t_local, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    if kv_mask is None:
        # Derive from k (not a fresh constant) so the mask carries k's
        # varying-axis type under shard_map — a plain jnp.ones would be
        # axis-invariant and break lax.scan's fixed carry typing after the
        # first ppermute.
        kv_mask = k[:, 0, :, 0] * 0.0 + 1.0
    kv_mask = kv_mask.astype(jnp.float32)

    qf = q.astype(jnp.float32) * scale
    # Send each K/V block to the next device; after i hops, device r holds
    # the block originally on device (r - i) mod n.
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_blk, v_blk, m_blk, acc, m_run, l_run = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32)
        )
        s = jnp.where(m_blk[:, None, None, :] > 0, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_run, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_run - m_new)
        l_new = l_run * corr + p.sum(axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
        )
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        m_nxt = jax.lax.ppermute(m_blk, axis_name, perm)
        return (k_nxt, v_nxt, m_nxt, acc_new, m_new, l_new), None

    # Constants start axis-invariant under shard_map's varying-axis typing,
    # while the accumulators become varying over every axis q/k/v vary over
    # (seq via the ppermute, plus e.g. 'data' when composed with DP). Derive
    # them from q so they inherit exactly the right varying-axis type and
    # lax.scan's carry type stays fixed across iterations.
    acc0 = qf * 0.0
    m0 = qf[..., :1] * 0.0 + NEG_INF
    l0 = qf[..., :1] * 0.0
    carry, _ = jax.lax.scan(
        step, (k, v, kv_mask, acc0, m0, l0), None, length=n
    )
    _, _, _, acc, _, l_fin = carry
    out = acc / jnp.maximum(l_fin, 1e-30)
    return out.astype(q.dtype)


def ring_attention_sharded(
    mesh: Mesh,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    *,
    axis_name: str = "seq",
) -> jax.Array:
    """Canonical wrapper: shard the T axis of global [B, H, T, D] arrays over
    `axis_name` of `mesh` and run ring attention. T must divide evenly by the
    axis size (pad upstream; the mask makes padded keys inert)."""
    spec_qkv = P(None, None, axis_name, None)
    spec_mask = P(None, axis_name)
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=jnp.float32)

    fn = shard_map(
        partial(ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
        out_specs=spec_qkv,
    )
    return fn(q, k, v, kv_mask)
