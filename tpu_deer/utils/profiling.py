"""Profiling: step timing, FLOPs accounting, device traces.

Parity with reference TrainingUtils (training.py:538-605), made real:
  * profile_training_speed — warmup + timed fwd/bwd steps, synced by a
    host VALUE FETCH (the TPU analogue of torch.cuda.synchronize; see its
    docstring for why block_until_ready is not enough here).
  * calculate_model_flops — the reference returns 0 (training.py:547-552);
    here the jitted computation's XLA cost analysis gives the real count.
  * trace() — context manager wrapping jax.profiler.trace for on-device
    timeline captures viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def _sync(out):
    """Force completion of `out` with a host fetch of one leaf.

    Through the remote-TPU tunnel, jax.block_until_ready acknowledges
    locally without waiting for remote execution (measured in bench.py's
    calibration); fetching a value is the only event that provably covers
    the work. On local backends this is equivalent to block_until_ready
    plus a tiny transfer.
    """
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        jax.device_get(leaves[0].ravel()[:1] if hasattr(leaves[0], "ravel")
                       else leaves[0])


def profile_step(
    fn: Callable, *args, iters: int = 100, warmup: int = 10
) -> dict[str, float]:
    """Time a jitted function; returns wall-clock stats in milliseconds.

    Note: the timing includes one host round trip per iteration (see
    _sync) — amortize by batching work per dispatch when profiling through
    a remote tunnel.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    t = np.asarray(times)
    return {
        "mean_ms": float(t.mean()),
        "p50_ms": float(np.percentile(t, 50)),
        "p90_ms": float(np.percentile(t, 90)),
        "p99_ms": float(np.percentile(t, 99)),
        "min_ms": float(t.min()),
        "iters": iters,
    }


def profile_training_speed(
    trainer, dataset, iters: int = 50, sync_per_step: bool = True
) -> dict[str, float]:
    """End-to-end train-step throughput for a DEERTrainer (train.trainer).

    Reference behavior at training.py:554-605, measured on the jitted step.

    Synchronization is a HOST FETCH of the step loss (jax.device_get), not
    block_until_ready: through the remote-TPU tunnel block_until_ready
    acknowledges locally without waiting for remote execution (measured: a
    chained matmul loop "finished" at an impossible 52 PFLOP/s), so only a
    value fetch provably covers the work. With sync_per_step=False all steps
    are dispatched as one donated-state chain and ONE final loss is fetched —
    the fetch forces the whole chain, and the tunnel round trip is amortized
    over the steps (what a real training loop sees; our trainer fetches once
    per epoch). sync_per_step=True pays the full round trip every step.
    """
    import jax.numpy as jnp

    from tpu_deer.data.pipeline import BatchIterator

    batch = next(iter(
        BatchIterator(dataset, trainer.config.batch_size, shuffle=False).epoch(0)
    ))
    device_batch = trainer._put(batch)
    w = jnp.asarray(1.0)
    s = jnp.asarray(1.0)

    state = trainer.state

    def step(state):
        new_state, aux = trainer._train_step(state, device_batch, w, s)
        return new_state, aux

    # Warmup (compilation) — device_get forces real completion
    state, aux = step(state)
    jax.device_get(aux["loss"])
    bs = trainer.config.batch_size
    if sync_per_step:
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            state, aux = step(state)
            jax.device_get(aux["loss"])
            times.append(time.perf_counter() - t0)
        trainer.state = state
        t = np.asarray(times)
        return {
            "step_ms_mean": float(t.mean() * 1e3),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "samples_per_sec": float(bs / t.mean()),
            "batch_size": bs,
        }
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state)
    # fetch, not block: forces execution of the whole donated-state chain
    jax.device_get(aux["loss"])
    elapsed = time.perf_counter() - t0
    trainer.state = state
    return {
        "step_ms_mean": float(elapsed / iters * 1e3),
        "step_ms_p50": float(elapsed / iters * 1e3),
        "samples_per_sec": float(bs * iters / elapsed),
        "batch_size": bs,
    }


# Peak dense-matmul throughput per chip (bf16), for MFU accounting.
# Sources: public TPU spec sheets; override with TPU_DEER_PEAK_TFLOPS.
PEAK_BF16_FLOPS_BY_KIND = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_flops_per_chip(device=None) -> Optional[float]:
    """Best-known peak bf16 FLOP/s for a device (None when unknown/CPU)."""
    import os

    env = os.environ.get("TPU_DEER_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    device = device or jax.devices()[0]
    if device.platform != "tpu":
        return None
    return PEAK_BF16_FLOPS_BY_KIND.get(device.device_kind)


def calculate_model_flops(fn: Callable, *args) -> Optional[float]:
    """FLOPs of one invocation via XLA cost analysis (None if unavailable)."""
    summary = cost_analysis_summary(fn, *args)
    return summary["flops"] if summary else None


def cost_analysis_summary(fn: Callable, *args) -> Optional[dict[str, float]]:
    """FLOPs and bytes accessed of one invocation, from the compiled
    executable's XLA cost analysis (post-fusion HLO, so 'bytes accessed'
    approximates real HBM traffic — fused intermediates don't count)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):  # older jax returns per-device list
            analysis = analysis[0]
        if not analysis:
            return None
        return {
            "flops": float(analysis.get("flops", 0.0)),
            "bytes": float(analysis.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


# Peak HBM bandwidth per chip, for roofline accounting.
# Sources: public TPU spec sheets; override with TPU_DEER_PEAK_HBM_GBPS.
PEAK_HBM_BYTES_BY_KIND = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def peak_hbm_bandwidth(device=None) -> Optional[float]:
    """Best-known HBM bytes/s for a device (None when unknown/CPU)."""
    import os

    env = os.environ.get("TPU_DEER_PEAK_HBM_GBPS")
    if env:
        return float(env) * 1e9
    device = device or jax.devices()[0]
    if device.platform != "tpu":
        return None
    return PEAK_HBM_BYTES_BY_KIND.get(device.device_kind)


def roofline_seconds(
    flops: float, bytes_accessed: float, peak_flops: float, hbm_bw: float
) -> float:
    """Execution-time bound under the two-ceiling roofline model: a program
    can finish no faster than its FLOPs at peak MXU rate nor faster than its
    HBM traffic at peak bandwidth.

    Caveat on the bandwidth ceiling: XLA's 'bytes accessed' sums every
    fusion's external operands/results, which over-counts true HBM traffic
    (values the compiler keeps resident across consumers are charged per
    use). The returned time is therefore a CONSERVATIVE (pessimistic)
    bound, and attainment = roofline_seconds / measured_seconds can exceed
    100% — that reads as "the program beats the naive per-op traffic bound",
    evidence of fusion quality, not a measurement error. For
    low-arithmetic-intensity programs (intensity below peak_flops/hbm_bw,
    ~240 FLOP/B on v5e) this bandwidth ceiling is the relevant one and MFU
    alone understates how close to the hardware limit the program runs."""
    return max(flops / peak_flops, bytes_accessed / hbm_bw)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_deer_trace"):
    """Capture an on-device profiler trace (view in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
