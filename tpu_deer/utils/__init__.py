"""Utilities: experiment logging, config handling, profiling."""

from tpu_deer.utils.logging import ExperimentLogger, MetricWriter
from tpu_deer.utils.config import load_yaml_config, default_config, save_yaml_config
