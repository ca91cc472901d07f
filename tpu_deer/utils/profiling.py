"""Profiling: step timing, FLOPs accounting, device traces.

Parity with reference TrainingUtils (training.py:538-605), made real:
  * profile_training_speed — warmup + timed fwd/bwd steps with
    block_until_ready (the TPU analogue of torch.cuda.synchronize).
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


def profile_step(
    fn: Callable, *args, iters: int = 100, warmup: int = 10
) -> dict[str, float]:
    """Time a jitted function; returns wall-clock stats in milliseconds."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
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


def profile_training_speed(trainer, dataset, iters: int = 50) -> dict[str, float]:
    """End-to-end train-step throughput for a DEERTrainer (train.trainer).

    Reference behavior at training.py:554-605, measured on the jitted step.
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

    # Warmup (compilation)
    state, aux = step(state)
    jax.block_until_ready(aux["loss"])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, aux = step(state)
        jax.block_until_ready(aux["loss"])
        times.append(time.perf_counter() - t0)
    trainer.state = state
    t = np.asarray(times)
    bs = trainer.config.batch_size
    return {
        "step_ms_mean": float(t.mean() * 1e3),
        "step_ms_p50": float(np.percentile(t, 50) * 1e3),
        "samples_per_sec": float(bs / t.mean()),
        "batch_size": bs,
    }


def calculate_model_flops(fn: Callable, *args) -> Optional[float]:
    """FLOPs of one invocation via XLA cost analysis (None if unavailable)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):  # older jax returns per-device list
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) if analysis else None
    except Exception:
        return None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_deer_trace"):
    """Capture an on-device profiler trace (view in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
