"""Training: trainer, checkpointing, schedules, multi-dataset orchestration."""

from tpu_deer.train.checkpoint import CheckpointManager
from tpu_deer.train.trainer import (
    DEERTrainer,
    TrainingConfig,
    TrainState,
    run_complete_training_pipeline,
)
