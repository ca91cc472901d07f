"""Blocked flash attention (online softmax) as Pallas TPU kernels — fwd + bwd.

For the raw-sequence encoders (BASELINE.json north star: "jitted lax.scan +
flash-attention blocks"). The utterance-scale model (T ≤ a few hundred)
doesn't *need* memory-blocked attention, but these kernels make the sequence
path scale to long contexts: K/V stream block-by-block through VMEM with
running max/normalizer statistics, so memory is O(T·D) instead of O(T²) in
BOTH directions:

  * forward  — online-softmax accumulation, emits O and the log-sum-exp
    statistics (lse) needed by the backward;
  * backward — two blocked kernels (the standard FlashAttention-2 recipe):
    dQ streams K/V blocks per Q block; dK/dV streams Q/dO blocks per K block;
    p is recomputed from lse, never materializing the [Tq, Tk] matrix.

Interface: flash_attention(q, k, v, kv_mask=None) over [B, H, T, D];
forward and gradients numerically equal to the einsum reference (tested on
CPU interpret and compiled TPU).

Measured (v5e, f32, experiments/kernel_bench.py): with the tuned default
512-blocks the forward runs at 38.5 TF/s at T=8192 (2.8x XLA's
materialized SDPA) and fwd+bwd is 3.1x faster than XLA — while keeping
O(T*D) memory. Block size is the critical knob: 128-blocks leave 2.6x on
the table because [block, 64] x [64, block] matmuls underfill the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                block_k: int, scale: float):
    """Block shapes (leading 1 = batch·head grid axis):
    q_ref [1, BQ, D], k_ref [1, Tk, D], v_ref [1, Tk, D], mask_ref [1, 1, Tk],
    o_ref [1, BQ, D], lse_ref [1, 1, BQ].
    """
    q = q_ref[0] * scale
    t_total = k_ref.shape[1]
    n_blocks = t_total // block_k
    bq, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        mask_blk = mask_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = jnp.where(mask_blk[None, :] > 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + p.sum(axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc, m_f, l_f = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l_f, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = (m_f + jnp.log(l_safe))[:, 0]


# ---------------------------------------------------------------------------
# Backward kernels (FlashAttention-2 style; p recomputed from lse)
# ---------------------------------------------------------------------------
def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, block_k: int, scale: float):
    """Per (bh, q-block): dq = scale * sum_k p*(dp - delta) @ K.

    q_ref/do_ref/dq_ref [1, BQ, D]; k_ref/v_ref [1, Tk, D];
    mask_ref [1, 1, Tk]; lse_ref/delta_ref [1, 1, BQ].
    """
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0][:, None]  # [BQ, 1]
    delta = delta_ref[0, 0][:, None]
    t_total = k_ref.shape[1]
    n_blocks = t_total // block_k

    def body(i, dq):
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        mask_blk = mask_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = scale * jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        s = jnp.where(mask_blk[None, :] > 0, s, NEG_INF)
        p = jnp.exp(s - lse)  # [BQ, BK]
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, n_blocks, body, jnp.zeros_like(q, dtype=jnp.float32)
    )
    dq_ref[0] = (scale * dq).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, scale: float):
    """Per (bh, k-block): dv = sum_q p^T @ dO; dk = scale * sum_q ds^T @ Q.

    k_ref/v_ref/dk_ref/dv_ref [1, BK, D]; q_ref/do_ref [1, Tq, D];
    mask_ref [1, 1, BK]; lse_ref/delta_ref [1, 1, Tq].
    """
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    mask_blk = mask_ref[0, 0]  # [BK]
    t_total = q_ref.shape[1]
    n_blocks = t_total // block_q

    def body(i, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(i * block_q, block_q), :]
        do_blk = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse_blk = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta_blk = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = scale * jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32)
        s = jnp.where(mask_blk[None, :] > 0, s, NEG_INF)
        p = jnp.exp(s - lse_blk)  # [BQ, BK]
        dv = dv + jnp.dot(p.T, do_blk, preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_blk)
        dk = dk + jnp.dot(ds.T, q_blk, preferred_element_type=jnp.float32)
        return dk, dv

    zeros = jnp.zeros_like(k_blk, dtype=jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_blocks, body, (zeros, zeros))
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Padding / flattening helpers
# ---------------------------------------------------------------------------
def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def _flatten_pad(q, k, v, kv_mask, block_q, block_k):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    qf = _pad_to(q.reshape(b * h, tq, d), 1, block_q)
    kf = _pad_to(k.reshape(b * h, tk, d), 1, block_k)
    vf = _pad_to(v.reshape(b * h, tk, d), 1, block_k)
    maskf = _pad_to(
        jnp.repeat(kv_mask.astype(jnp.float32), h, axis=0)[:, None, :], 2,
        block_k,
    )
    return qf, kf, vf, maskf


# ---------------------------------------------------------------------------
# Forward / backward impls
# ---------------------------------------------------------------------------
def _forward_impl(q, k, v, kv_mask, block_q, block_k, interpret):
    b, h, tq, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    qf, kf, vf, maskf = _flatten_pad(q, k, v, kv_mask, block_q, block_k)
    tq_p, tk_p = qf.shape[1], kf.shape[1]
    bh = b * h
    grid = (bh, tq_p // block_q)

    q_row = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kv_full = pl.BlockSpec((1, tk_p, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_full = pl.BlockSpec((1, 1, tk_p), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    lse_row = pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[q_row, kv_full, kv_full, mask_full],
        out_specs=(q_row, lse_row),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, tq_p), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out[:, :tq].reshape(b, h, tq, d), (qf, kf, vf, maskf, lse, out)


def _backward_impl(res, g, shape, block_q, block_k, interpret):
    qf, kf, vf, maskf, lse, of = res
    b, h, tq, d = shape
    tk = kf.shape[1]  # padded
    tq_p = qf.shape[1]
    bh = b * h
    scale = 1.0 / float(np.sqrt(d))

    gof = _pad_to(g.reshape(bh, tq, d), 1, block_q).astype(jnp.float32)
    # delta_i = sum_d dO_id * O_id (padded rows contribute zeros)
    delta = jnp.sum(gof * of.astype(jnp.float32), axis=-1)[:, None, :]  # [BH,1,Tq_p]

    q_row = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    q_full = pl.BlockSpec((1, tq_p, d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_row = pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_full = pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_full = pl.BlockSpec((1, 1, tk), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_row = pl.BlockSpec((1, 1, block_k), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    stat_row = pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    stat_full = pl.BlockSpec((1, 1, tq_p), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, scale=scale),
        grid=(bh, tq_p // block_q),
        in_specs=[q_row, kv_full, kv_full, mask_full, q_row, stat_row,
                  stat_row],
        out_specs=q_row,
        out_shape=jax.ShapeDtypeStruct((bh, tq_p, d), jnp.float32),
        interpret=interpret,
    )(qf, kf, vf, maskf, gof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, scale=scale),
        grid=(bh, tk // block_k),
        in_specs=[q_full, kv_row, kv_row, mask_row, q_full, stat_full,
                  stat_full],
        out_specs=(kv_row, kv_row),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, maskf, gof, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kv_mask, block_q, block_k, interpret):
    out, _ = _forward_impl(q, k, v, kv_mask, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, kv_mask, block_q, block_k, interpret):
    out, res = _forward_impl(q, k, v, kv_mask, block_q, block_k, interpret)
    return out, (res, q.shape, k.shape[2], kv_mask)


def _flash_bwd(block_q, block_k, interpret, saved, g):
    res, q_shape, tk, kv_mask = saved
    b, h, tq, d = q_shape
    dqf, dkf, dvf = _backward_impl(
        res, g, q_shape, block_q, block_k, interpret
    )
    dq = dqf[:, :tq].reshape(b, h, tq, d).astype(g.dtype)
    dk = dkf[:, :tk].reshape(b, h, tk, d).astype(g.dtype)
    dv = dvf[:, :tk].reshape(b, h, tk, d).astype(g.dtype)
    return dq, dk, dv, jnp.zeros_like(kv_mask)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _auto_block(t: int) -> int:
    """Default block size for a sequence length.

    Measured on v5e (T=4096, D=64, f32): 512-blocks run the forward at
    21.8 TF/s vs 8.5 at 128-blocks — 2.6x, and 1.8x faster than XLA's
    materialized SDPA. The [block, D] @ [D, block] matmuls need block >= a
    few hundred to fill the MXU when D is small. Short sequences round up
    to the 128-lane tile instead, so tiny utterance-scale calls don't pad
    5x.
    """
    if t >= 512:
        return 512
    return max(128, ((t + 127) // 128) * 128)


# Measured crossovers vs XLA's materialized SDPA (RESULTS_kernels.md, v5e,
# D=64): forward-only flash loses at T=1024 (1.76 vs 1.59 ms) and wins from
# T≈2048 on; forward+backward flash already wins at T=1024 (2.77 vs
# 4.29 ms) because the recomputing backward avoids re-reading the [T,T]
# probability matrix from HBM. Hence two thresholds.
FLASH_AUTO_INFER_T = 2048
FLASH_AUTO_TRAIN_T = 1024


def resolve_use_flash(use_flash, t_k: int, training: bool = False) -> bool:
    """Resolve a bool | "auto" flag to a concrete kernel choice.

    "auto" picks the flash kernel when the key length reaches the measured
    crossover for the phase (training = gradients will flow, so the
    fwd+bwd crossover applies). Explicit True/False always wins. Note the
    flash path skips attention-prob dropout (standard for flash kernels);
    under "auto" that substitution only ever happens at T ≥ 1024 where the
    SDPA path's [T,T] dropout mask is itself an HBM liability.
    """
    if use_flash == "auto":
        return t_k >= (FLASH_AUTO_TRAIN_T if training else FLASH_AUTO_INFER_T)
    return bool(use_flash)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Attention over [B, H, Tq, D] / [B, H, Tk, D]; kv_mask [B, Tk] (1=valid).

    Returns [B, H, Tq, D] = softmax(q·kᵀ/√D + mask)·v. Fully differentiable:
    both forward and backward are blocked Pallas kernels (O(T·D) memory).
    Block sizes default to the measured sweet spot (`_auto_block`).
    """
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=jnp.float32)
    block_q = block_q or _auto_block(q.shape[2])
    block_k = block_k or _auto_block(k.shape[2])
    return _flash(
        q, k, v, kv_mask.astype(jnp.float32), block_q, block_k, interpret
    )


def reference_attention(q, k, v, kv_mask=None):
    """Einsum reference for testing: softmax(q·kᵀ/√D)·v with key mask."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
