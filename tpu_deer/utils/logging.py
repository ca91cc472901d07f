"""Experiment logging: per-experiment dirs, scalar metrics, artifacts.

Parity with reference ExperimentLogger (training.py:608-655) + TensorBoard
scalar logging (training.py:486-507). Scalars always go to a JSONL stream
(machine-readable, dependency-free); TensorBoard event files are written too
when torch's SummaryWriter is importable (it is in this image).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


class MetricWriter:
    """Scalar writer: JSONL always; TensorBoard when available."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}
            )
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, metrics: dict[str, float], step: int, prefix: str = ""):
        for k, v in metrics.items():
            try:
                self.scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class ExperimentLogger:
    """Per-experiment directory with config.json, results.json, and a log file."""

    def __init__(self, base_dir: str, experiment_name: Optional[str] = None):
        if experiment_name is None:
            experiment_name = time.strftime("experiment_%Y%m%d_%H%M%S")
        self.experiment_dir = os.path.join(base_dir, experiment_name)
        for sub in ("models", "plots", "logs", "results", "configs", "data"):
            os.makedirs(os.path.join(self.experiment_dir, sub), exist_ok=True)

        self.logger = logging.getLogger(f"tpu_deer.{experiment_name}")
        self.logger.setLevel(logging.INFO)
        if not self.logger.handlers:
            fh = logging.FileHandler(
                os.path.join(self.experiment_dir, "logs", "experiment.log")
            )
            fh.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            )
            self.logger.addHandler(fh)
            sh = logging.StreamHandler()
            sh.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
            self.logger.addHandler(sh)

        self.metrics = MetricWriter(os.path.join(self.experiment_dir, "logs"))

    def path(self, *parts: str) -> str:
        return os.path.join(self.experiment_dir, *parts)

    def save_config(self, config: dict):
        with open(self.path("configs", "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    def save_results(self, results: dict):
        with open(self.path("results", "results.json"), "w") as f:
            json.dump(results, f, indent=2, default=str)

    def info(self, msg: str):
        self.logger.info(msg)
