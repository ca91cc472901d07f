"""Checkpoint manager: params + optimizer state + step + RNG + best metric.

The reference *intended* this (`ModelCheckpoint` is imported at
training.py:31 and called at training.py:414-448) but the class does not
exist anywhere — checkpointing silently fell back to raw torch.save of
weights only. This implementation makes the capability real:

  * full training-state serialization (flax msgpack — framework-neutral bytes)
  * best-metric and periodic policies, with pruning of stale periodic saves
  * exact resume: params, optimizer state, step counter, dropout RNG key,
    best-metric-so-far
  * optional async writes (`async_save=True`): the device→host snapshot is
    taken synchronously (so the checkpoint is consistent with the step that
    requested it), but serialization, disk I/O, best-copy, and pruning run
    on a single background worker — the train loop never stalls on disk.
    Reads (`restore`/`all_steps`/`metadata`) and `wait()` drain the queue
    first, so the async mode is observationally identical to sync.
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 3,
                 async_save: bool = False):
        self.directory = directory
        self.keep_last = keep_last
        os.makedirs(directory, exist_ok=True)
        # One worker: writes land in request order, so best-copy/prune can't
        # race an in-flight state write.
        self._pool = ThreadPoolExecutor(max_workers=1) if async_save else None
        self._pending: list = []

    def wait(self) -> None:
        """Block until every queued async write has hit disk (re-raises the
        first worker exception, if any — but always drains the whole queue
        first, so a caller that catches the error is not left with stale
        futures or still-in-flight writes)."""
        first_exc = None
        for fut in self._pending:
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001
                if first_exc is None:
                    first_exc = e
                else:
                    import logging

                    logging.getLogger(__name__).error(
                        "additional async checkpoint write failed: %r", e
                    )
        self._pending.clear()
        if first_exc is not None:
            raise first_exc

    # -- paths -----------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    @property
    def best_dir(self) -> str:
        return os.path.join(self.directory, "best")

    # -- save ------------------------------------------------------------
    def save(
        self,
        state: Any,
        step: int,
        metrics: Optional[dict] = None,
        is_best: bool = False,
    ) -> str:
        """Serialize `state` (any pytree) + metadata. Returns the ckpt dir."""
        path = self._step_dir(step)
        # Snapshot on the caller thread: after device_get the bytes can't be
        # mutated by subsequent (donating) train steps.
        host_state = jax.device_get(state)

        def commit():
            self._write(path, host_state, step, metrics)
            if is_best:
                if os.path.isdir(self.best_dir):
                    shutil.rmtree(self.best_dir)
                shutil.copytree(path, self.best_dir)
            self._prune()

        if self._pool is None:
            commit()
        else:
            # Surface past worker failures at the next save. Completed
            # futures are removed from the queue BEFORE raising, so one
            # failure is reported exactly once (a stale future must not
            # re-raise on every later call) — but every done future is
            # inspected, so a second failure is not silently dropped.
            done = [f for f in self._pending if f.done()]
            self._pending = [f for f in self._pending if not f.done()]
            self._pending.append(self._pool.submit(commit))
            first_exc = None
            for f in done:
                try:
                    f.result()
                except Exception as e:  # noqa: BLE001
                    if first_exc is None:
                        first_exc = e
                    else:
                        import logging

                        logging.getLogger(__name__).error(
                            "additional async checkpoint write failed: %r", e
                        )
            if first_exc is not None:
                raise first_exc
        return path

    def _write(self, path: str, host_state: Any, step: int,
               metrics: Optional[dict]):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(host_state))
        meta = {"step": step, "metrics": _to_jsonable(metrics or {})}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)

    def _prune(self):
        # NB: must NOT call all_steps() — that drains the async queue, and
        # _prune runs ON the worker, so it would wait on its own future.
        steps = self._list_steps()
        for step in steps[: -self.keep_last] if self.keep_last > 0 else []:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)

    def _list_steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                out.append(int(name.split("_")[1]))
        return sorted(out)

    # -- restore ---------------------------------------------------------
    def all_steps(self) -> list[int]:
        self.wait()
        return self._list_steps()

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `template` (an abstract or concrete
        state pytree). step=None → latest; step='best' → best checkpoint."""
        self.wait()
        if step == "best":
            path = self.best_dir
        else:
            if step is None:
                step = self.latest_step()
                if step is None:
                    raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._step_dir(step)
        with open(os.path.join(path, "state.msgpack"), "rb") as f:
            return flax.serialization.from_bytes(template, f.read())

    def restore_params(self, params_template: Any, step=None) -> Any:
        """Restore just the model parameters from a saved TrainState (for
        serving — no optimizer state needed). step=None → latest; 'best' →
        the best checkpoint."""
        self.wait()
        if step == "best":
            path = self.best_dir
        else:
            if step is None:
                step = self.latest_step()
                if step is None:
                    raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._step_dir(step)
        with open(os.path.join(path, "state.msgpack"), "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        return flax.serialization.from_state_dict(params_template, raw["params"])

    def metadata(self, step: Optional[int] = None) -> dict:
        self.wait()
        if step == "best":
            path = self.best_dir
        else:
            step = step if step is not None else self.latest_step()
            path = self._step_dir(step)
        with open(os.path.join(path, "meta.json")) as f:
            return json.load(f)


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    return obj
