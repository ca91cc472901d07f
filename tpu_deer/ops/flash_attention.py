"""Blocked flash attention (online softmax) as a Pallas TPU kernel.

For the raw-sequence encoders (BASELINE.json north star: "jitted lax.scan +
flash-attention blocks"). The utterance-scale model (T ≤ a few hundred)
doesn't *need* memory-blocked attention, but this kernel makes the sequence
path scale to long contexts: K/V are streamed block-by-block through VMEM
with running max/normalizer statistics (the standard online-softmax
recurrence), so memory is O(T_q · D) instead of O(T_q · T_k).

Interface: flash_attention(q, k, v, kv_mask=None) over [B, H, T, D];
numerically equal to reference einsum attention (tested, CPU interpret +
TPU compiled).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int,
                  scale: float):
    """One (batch·head, q-block) cell: stream K/V blocks with online softmax.

    Block shapes inside the kernel (leading 1 = the grid's batch·head axis):
      q_ref [1, BQ, D], k_ref [1, T, D], v_ref [1, T, D],
      mask_ref [1, 1, T], o_ref [1, BQ, D]
    """
    q = q_ref[0] * scale
    t_total = k_ref.shape[1]
    n_blocks = t_total // block_k
    bq, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [BQ, BK]
        mask_blk = mask_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = jnp.where(mask_blk[None, :] > 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [BQ, BK]
        correction = jnp.exp(m_prev - m_new)  # [BQ, 1]
        l_new = l_prev * correction + p.sum(axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc, m_final, l_final = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)


# Import here so the module imports cleanly even if pallas is unavailable.
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_mask, block_q, block_k, interpret):
    return _flash_forward_impl(q, k, v, kv_mask, block_q, block_k, interpret)


def _flash_fwd(q, k, v, kv_mask, block_q, block_k, interpret):
    out = _flash_forward_impl(q, k, v, kv_mask, block_q, block_k, interpret)
    return out, (q, k, v, kv_mask)


def _flash_bwd(block_q, block_k, interpret, residuals, g):
    # Backward through the mathematically identical einsum attention
    # (O(T^2) activations — acceptable at utterance scale; a blocked Pallas
    # backward is the long-context upgrade path).
    q, k, v, kv_mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: reference_attention(q, k, v, kv_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(kv_mask)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Attention over [B, H, Tq, D] / [B, H, Tk, D]; kv_mask [B, Tk] (1=valid).

    Returns [B, H, Tq, D]; equals softmax(q·kᵀ/√D + mask)·v. Differentiable
    (custom VJP).
    """
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=jnp.float32)
    return _flash(q, k, v, kv_mask.astype(jnp.float32), block_q, block_k, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _flash_forward_impl(q, k, v, kv_mask, block_q, block_k, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / float(np.sqrt(d))

    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), dtype=jnp.float32)
    kv_mask = kv_mask.astype(jnp.float32)

    # Flatten batch·heads; pad sequence dims to block multiples.
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    maskf = jnp.repeat(kv_mask, h, axis=0)[:, None, :]  # [B*H, 1, Tk]

    qf = _pad_to(qf, 1, block_q)
    kf = _pad_to(kf, 1, block_k)
    vf = _pad_to(vf, 1, block_k)
    maskf = _pad_to(maskf, 2, block_k)  # padded keys get mask 0 → ignored
    tq_p, tk_p = qf.shape[1], kf.shape[1]

    grid = (b * h, tq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out[:, :tq].reshape(b, h, tq, d)


def reference_attention(q, k, v, kv_mask=None):
    """Einsum reference for testing: softmax(q·kᵀ/√D)·v with key mask."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
